"""Rigid-water holonomic constraints: analytic SETTLE + iterative SHAKE.

The reference's water ground truth and rollouts run RIGID water: OpenMM
applies distance constraints to every O-H/H-H pair (reference:
/root/reference/dataset/generate_tip3p_data.py:55-78 — WaterBox defaults,
constrained=True, dt=2fs) and the rollout side keeps them through the
constraint-projection dummy integrators
(/root/reference/code/water/hack_integrator.py:180-188,193-347). This module
is the TPU-native equivalent: a branch-free, closed-form SETTLE position
projection (Miyamoto & Kollman, J. Comput. Chem. 13:952, 1992) and an exact
3x3 linear-solve velocity projection (the RATTLE condition), both vmapped
over molecules so the whole solver is three batched [M,...] einsum-scale ops
inside the jitted MD step — no iteration, no data-dependent control flow.

A fixed-iteration SHAKE/RATTLE solver is included as the independent test
oracle for SETTLE (and as the generic projector for non-water topologies).

Geometry convention: atoms ordered O,H1,H2 per molecule (the dataset layout,
/root/reference/code/train_utils.py:24-30). Constraints: |O-H1| = |O-H2| =
d_oh, |H1-H2| = d_hh.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gamd_tpu.core import space

# TPU's DEFAULT matmul precision is bf16: for constraint geometry that
# rounds coordinates to 8 mantissa bits, and the resulting projection error
# pumps energy into the system every step (measured: 300 K -> 2200 K in
# 4k rigid-water steps). All matmuls/einsums here are tiny (3x3), so full
# precision is free.
_HI = jax.lax.Precision.HIGHEST


def _solve3(a, b):
    """Solve a[3,3] x = b[3] by Cramer's rule with elementwise ops only
    (jnp.linalg.solve lowers through default-precision matmuls on TPU)."""
    c00 = a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1]
    c01 = a[1, 2] * a[2, 0] - a[1, 0] * a[2, 2]
    c02 = a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0]
    det = a[0, 0] * c00 + a[0, 1] * c01 + a[0, 2] * c02
    x0 = (b[0] * c00
          + a[0, 1] * (a[1, 2] * b[2] - b[1] * a[2, 2])
          + a[0, 2] * (b[1] * a[2, 1] - a[1, 1] * b[2]))
    x1 = (a[0, 0] * (b[1] * a[2, 2] - a[1, 2] * b[2])
          + b[0] * c01
          + a[0, 2] * (a[1, 0] * b[2] - b[1] * a[2, 0]))
    x2 = (a[0, 0] * (a[1, 1] * b[2] - b[1] * a[2, 1])
          + a[0, 1] * (b[1] * a[2, 0] - a[1, 0] * b[2])
          + b[0] * c02)
    return jnp.stack([x0, x1, x2]) / det


class RigidWaterParams(NamedTuple):
    d_oh: float          # O-H constraint length [A]
    d_hh: float          # H-H constraint length [A]
    m_o: float = 15.9994
    m_h: float = 1.008


def tip3p_rigid_params(r_oh: float = 0.9572,
                       theta0: float = 104.52 * np.pi / 180.0):
    """Constraint lengths from the rigid-monomer geometry (same numbers for
    TIP3P and TIP4P-Ew)."""
    return RigidWaterParams(d_oh=r_oh, d_hh=2.0 * r_oh * np.sin(theta0 / 2))


def _unwrap_molecules(pos, box):
    """[M,3,3] molecule-local coordinates with H sites made whole around O.

    MD state positions are unwrapped during dynamics, but initial
    configurations may arrive wrapped with molecules split across the
    periodic boundary; constraint algebra needs whole molecules.
    """
    o = pos[:, 0:1, :]
    return jnp.concatenate([o, o + space.min_image(pos[:, 1:, :] - o, box)],
                           axis=1)


class RigidWater:
    """SETTLE/RATTLE projections for an N = 3M rigid-water system.

    API consumed by the integrators (gamd_tpu.md.integrators):
        positions(x_ref [N,3], x_new [N,3]) -> x_constrained [N,3]
        velocities(x [N,3], v [N,3]) -> v_constrained [N,3]
        n_constraints: int (3 per molecule), for NDF accounting.
    """

    def __init__(self, n_molecules: int, box: float,
                 params: RigidWaterParams = tip3p_rigid_params(),
                 method: str = "settle"):
        # Default is analytic SETTLE (one closed-form projection/step).
        # The round-2 energy pumping was root-caused to f32 absolute-COM
        # rounding amplified by sin(phi) = z/ra into constraint-null-space
        # rotation noise; settle_correction now works entirely in pair
        # differences and measured NVE drift on both CPU and TPU is at or
        # below SHAKE's (258 molecules, TPU: settle +0.008 vs shake
        # +0.305 kJ/mol/ps — see RESULTS.md). method="shake" remains the
        # iterative cross-check oracle.
        self.n_molecules = n_molecules
        self.box = box
        self.params = params
        self.method = method
        self.n_constraints = 3 * n_molecules

    # -- integrator hooks ---------------------------------------------------

    def positions(self, x_ref, x_new):
        ref = _unwrap_molecules(x_ref.reshape(-1, 3, 3), self.box)
        new = ref + space.min_image(
            x_new.reshape(-1, 3, 3) - x_ref.reshape(-1, 3, 3), self.box)
        if self.method == "settle":
            out = settle(ref, new, self.params)
        else:
            out = shake(ref, new, self.params)
        # Preserve the caller's unwrapped frame: apply the CORRECTION.
        return (x_new.reshape(-1, 3, 3) + (out - new)).reshape(-1, 3)

    def velocities(self, x, v):
        pos = _unwrap_molecules(x.reshape(-1, 3, 3), self.box)
        return rattle_velocities(pos, v.reshape(-1, 3, 3),
                                 self.params).reshape(-1, 3)

    def project_initial(self, x):
        """Snap an approximately-rigid configuration onto the constraint
        manifold exactly (used once after minimization)."""
        pos = _unwrap_molecules(x.reshape(-1, 3, 3), self.box)
        out = shake(pos, pos, self.params, iters=200)
        return (x.reshape(-1, 3, 3)
                + (out - pos)).reshape(-1, 3)

    def residual(self, x):
        """Max constraint violation |d - d0| over the system [A]."""
        pos = _unwrap_molecules(x.reshape(-1, 3, 3), self.box)
        p = self.params
        d_oh1 = jnp.linalg.norm(pos[:, 1] - pos[:, 0], axis=-1)
        d_oh2 = jnp.linalg.norm(pos[:, 2] - pos[:, 0], axis=-1)
        d_hh = jnp.linalg.norm(pos[:, 2] - pos[:, 1], axis=-1)
        return jnp.max(jnp.stack([jnp.abs(d_oh1 - p.d_oh),
                                  jnp.abs(d_oh2 - p.d_oh),
                                  jnp.abs(d_hh - p.d_hh)]))


# ---------------------------------------------------------------------------
# Analytic SETTLE
# ---------------------------------------------------------------------------

def _canonical_triangle(p: RigidWaterParams):
    """Mass-centered canonical monomer: O at (0, ra, 0), H at (-+rc, -rb, 0).

    t = triangle height; the COM splits it as ra : rb = 2 m_h : m_o.
    """
    rc = 0.5 * p.d_hh
    t = np.sqrt(p.d_oh**2 - rc**2)
    m_tot = p.m_o + 2.0 * p.m_h
    ra = t * 2.0 * p.m_h / m_tot
    rb = t * p.m_o / m_tot
    return ra, rb, rc


@partial(jax.jit, static_argnums=(2,))
def settle_correction(old, new, params: RigidWaterParams):
    """Constraint correction Delta [M,3,3] such that new + Delta lies on the
    constraint manifold, given `old` (constraint-satisfying) positions. Both
    inputs in molecule-whole coordinates.

    Closed-form Miyamoto-Kollman: express the constrained triangle as the
    canonical monomer rotated by Rz(theta) Rx(phi) Ry(psi) about the new
    center of mass, in a frame whose z-axis is the OLD plane normal. phi and
    psi come from matching the z components (z_O and z_H1 - z_H2) of the
    unconstrained positions; theta from zero net torque of the corrections
    about z (constraint impulses act along old bond directions, so they
    exert no torque; the COM condition makes the torque origin-free, which
    is why the old coordinates can be taken relative to old-O).

    f32 numerics (the round-2 "placement bias" root cause): every
    COM-relative vector here is assembled from PAIR DIFFERENCES of nearby
    atoms — the absolute center of mass is never materialized. Forming
    `com` from ~box-sized coordinates costs ~2e-6 A of f32 rounding, and
    sin(phi) divides the O-to-COM z-offset by ra ~ 0.066 A, amplifying
    that rounding ~15x into a rigid ROTATION of the placed molecule:
    constraint-null-space noise that the RATTLE velocity projection cannot
    remove, injected at constant magnitude per projection — hence NVE
    heating that scales as 1/dt^3 per unit time (measured 1:5:56 for
    dt = 2:1:0.5 fs against the 1:8:64 prediction). In relative arithmetic
    (differences of atoms < 1 A apart are exact or near-exact in f32) the
    self-map noise drops to SHAKE's level and the correction form also
    avoids re-quantizing the output against the box origin.
    """
    p = params
    ra, rb, rc = _canonical_triangle(p)
    m_tot = p.m_o + 2.0 * p.m_h
    w_h = p.m_h / m_tot

    def one(old3, new3):
        # COM-relative positions from pair differences (no absolute COM):
        # r0 - com = w_h * ((r0-r1) + (r0-r2)), etc.
        d01, d02 = new3[0] - new3[1], new3[0] - new3[2]
        a1 = w_h * (d01 + d02)
        b1 = a1 - d01
        c1 = a1 - d02
        b0, c0 = old3[1] - old3[0], old3[2] - old3[0]

        # Orthonormal frame: z = old-plane normal, a1 in the y-z plane.
        n0 = jnp.cross(b0, c0)
        n0 = n0 / jnp.linalg.norm(n0)
        n1 = jnp.cross(a1, n0)
        n1 = n1 / jnp.linalg.norm(n1)
        n2 = jnp.cross(n0, n1)
        rot = jnp.stack([n1, n2, n0])          # lab -> primed (rows)

        mv = lambda A, x: jnp.einsum("ij,j->i", A, x, precision=_HI)
        a1p, b1p, c1p = mv(rot, a1), mv(rot, b1), mv(rot, c1)
        b0p, c0p = mv(rot, b0), mv(rot, c0)

        sinphi = jnp.clip(a1p[2] / ra, -1.0, 1.0)
        cosphi = jnp.sqrt(1.0 - sinphi**2)
        sinpsi = jnp.clip((b1p[2] - c1p[2]) / (2.0 * rc * cosphi),
                          -1.0, 1.0)
        cospsi = jnp.sqrt(1.0 - sinpsi**2)

        # Canonical triangle after Rx(phi) Ry(psi).
        a2 = jnp.array([0.0, ra * cosphi, ra * sinphi])
        b2 = jnp.array([-rc * cospsi,
                        -rb * cosphi - rc * sinpsi * sinphi,
                        -rb * sinphi + rc * sinpsi * cosphi])
        c2 = jnp.array([rc * cospsi,
                        -rb * cosphi + rc * sinpsi * sinphi,
                        -rb * sinphi - rc * sinpsi * cosphi])

        # Zero-torque condition about z: P sin(theta) + Q cos(theta) = G.
        pp = (b0p[0] * b2[0] + b0p[1] * b2[1]
              + c0p[0] * c2[0] + c0p[1] * c2[1])
        qq = (b0p[0] * b2[1] - b0p[1] * b2[0]
              + c0p[0] * c2[1] - c0p[1] * c2[0])
        gg = (b0p[0] * b1p[1] - b0p[1] * b1p[0]
              + c0p[0] * c1p[1] - c0p[1] * c1p[0])
        pq2 = pp * pp + qq * qq
        disc = jnp.sqrt(jnp.maximum(pq2 - gg * gg, 0.0))
        sinth = (pp * gg - qq * disc) / pq2
        costh = jnp.sqrt(jnp.maximum(1.0 - sinth**2, 0.0))

        def rz(r):
            return jnp.array([r[0] * costh - r[1] * sinth,
                              r[0] * sinth + r[1] * costh,
                              r[2]])

        out = jnp.stack([rz(a2), rz(b2), rz(c2)])
        # rows @ rot == rot^T applied; subtract the unconstrained
        # COM-relative positions -> correction, all in ~1 A arithmetic.
        return (jnp.einsum("ij,jk->ik", out, rot, precision=_HI)
                - jnp.stack([a1, b1, c1]))

    return jax.vmap(one)(old, new)


def settle(old, new, params: RigidWaterParams):
    """Project `new` [M,3,3] onto the constraint manifold, given `old`
    (constraint-satisfying) positions (see settle_correction)."""
    return new + settle_correction(old, new, params)


# ---------------------------------------------------------------------------
# SHAKE / RATTLE (iterative oracle + generic fallback)
# ---------------------------------------------------------------------------

_PAIRS = ((0, 1), (0, 2), (1, 2))


def _targets(p: RigidWaterParams):
    return (p.d_oh, p.d_oh, p.d_hh)


@partial(jax.jit, static_argnums=(2, 3))
def shake(old, new, params: RigidWaterParams, iters: int = 60):
    """Fixed-iteration SHAKE on [M,3,3] molecules (Gauss-Seidel over the
    three pair constraints, constraint direction taken from `old`)."""
    p = params
    inv_m = jnp.array([1.0 / p.m_o, 1.0 / p.m_h, 1.0 / p.m_h])
    d2 = jnp.array(_targets(p)) ** 2

    def one(old3, new3):
        def body(x, _):
            for k, (i, j) in enumerate(_PAIRS):
                r = x[i] - x[j]
                r_old = old3[i] - old3[j]
                diff = jnp.sum(r * r) - d2[k]
                g = diff / (2.0 * jnp.sum(r * r_old)
                            * (inv_m[i] + inv_m[j]))
                x = x.at[i].add(-g * inv_m[i] * r_old)
                x = x.at[j].add(g * inv_m[j] * r_old)
            return x, None

        x, _ = jax.lax.scan(body, new3, None, length=iters)
        return x

    return jax.vmap(one)(old, new)


@jax.jit
def _rattle_velocities_impl(pos, vel, inv_m):
    def one(x, v):
        e = jnp.stack([(x[i] - x[j]) / jnp.linalg.norm(x[i] - x[j])
                       for i, j in _PAIRS])              # [3,3] unit bonds
        g = jnp.stack([jnp.sum(e[k] * (v[i] - v[j]))
                       for k, (i, j) in enumerate(_PAIRS)])
        # M_kl = (sum_a S_ka S_la / m_a) e_k . e_l ; S = +1 first, -1 second.
        s = jnp.zeros((3, 3)).at[0, 0].set(1).at[0, 1].set(-1) \
            .at[1, 0].set(1).at[1, 2].set(-1) \
            .at[2, 1].set(1).at[2, 2].set(-1)
        c = jnp.einsum("ka,la,a->kl", s, s, inv_m, precision=_HI)
        mat = c * jnp.einsum("ka,la->kl", e, e, precision=_HI)
        tau = _solve3(mat, -g)
        dv = jnp.einsum("k,ka,kx->ax", tau, s, e,
                        precision=_HI) * inv_m[:, None]
        return v + dv

    return jax.vmap(one)(pos, vel)


def rattle_velocities(pos, vel, params: RigidWaterParams):
    """Exact velocity projection: e_k . (v_i - v_j) = 0 for all constraints,
    via the batched 3x3 Lagrange-multiplier solve (one linear solve per
    molecule, vmapped)."""
    p = params
    inv_m = jnp.array([1.0 / p.m_o, 1.0 / p.m_h, 1.0 / p.m_h])
    return _rattle_velocities_impl(pos, vel, inv_m)
