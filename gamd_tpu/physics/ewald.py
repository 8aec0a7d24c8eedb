"""First-party Ewald summation for long-range electrostatics.

The reference's water ground truth comes from openmmtools ``WaterBox``
test systems (reference: /root/reference/dataset/generate_tip3p_data.py:55-57),
whose default nonbonded method is **PME** (Particle-Mesh Ewald, cutoff 10 A,
Ewald error tolerance 1e-5, LJ switched over the last 1.5 A). The damped-
shifted-force Coulomb the earlier rounds generated data with is a different
potential — it truncates the conditionally-convergent lattice sum — so models
trained on it were never label-compatible with the upstream protocol.

This module implements the classical (plain) Ewald sum, of which PME is a
mesh-interpolated approximation: at matched error tolerance the two agree to
the tolerance itself, so plain Ewald is the *more* exact realization of the
reference's physics. At the reference's system sizes (<= 1004 charge sites)
the O(N^2) real-space pair sum and the O(N*K) reciprocal sum are trivially
fast as dense XLA ops on TPU — no mesh/FFT machinery is warranted.

Decomposition (cubic box, side L, charges q_i at r_i, neutral system):

  E = E_real + E_recip + E_self + E_excl

  E_real  = k_e/2 sum_{i!=j, r_ij < rc}  q_i q_j erfc(alpha r_ij) / r_ij
            (minimum-image; intra-molecular pairs EXCLUDED)
  E_recip = k_e * 2 pi / V  sum_{k != 0}  exp(-|k|^2 / 4 alpha^2)/|k|^2 |S(k)|^2,
            S(k) = sum_i q_i exp(i k . r_i)
  E_self  = -k_e * alpha/sqrt(pi) sum_i q_i^2
  E_excl  = -k_e sum_{(i,j) excluded}  q_i q_j erf(alpha r_ij) / r_ij
            (removes the reciprocal sum's contribution for intra-molecular
            pairs, which the real-space term never counted)

alpha follows OpenMM's rule alpha = sqrt(-log(2 tol))/cutoff; the k-space
cutoff keeps every neglected shell below `recip_tol` of the leading Gaussian
factor. Everything is differentiable — forces come from jax.grad, which also
projects M-site (virtual charge site) forces onto real atoms automatically.

Units: angstrom, elementary charge; energies in kJ/mol via `coulomb_k`.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gamd_tpu.core import space, units


class EwaldParams(NamedTuple):
    """Static Ewald configuration (closed over by jitted force functions)."""
    alpha: float          # splitting parameter [1/A]
    cutoff: float         # real-space cutoff [A]
    kvecs: np.ndarray     # [K, 3] reciprocal vectors (half-space) [1/A]
    kfac: np.ndarray      # [K] 2 * (2 pi / V) * exp(-k^2/4a^2)/k^2 (x2: half-space)
    coulomb_k: float = 332.0637128 * units.KCAL_TO_KJ  # kJ mol^-1 A e^-2


def make_ewald_params(box: float, cutoff: float = 10.0,
                      tolerance: float = 1.0e-5,
                      recip_tol: float = 1.0e-7,
                      coulomb_k: float = 332.0637128 * units.KCAL_TO_KJ
                      ) -> EwaldParams:
    """Ewald parameters for a cubic box of side `box` [A].

    `tolerance` maps to alpha exactly as OpenMM's
    NonbondedForceImpl::calcEwaldParameters does (alpha =
    sqrt(-log(2 tol))/cutoff); the reciprocal cutoff keeps the neglected
    Gaussian tail below `recip_tol`.
    """
    alpha = math.sqrt(-math.log(2.0 * tolerance)) / cutoff
    # exp(-k^2/4a^2) < recip_tol  =>  k_cut = 2 a sqrt(-ln recip_tol)
    k_cut = 2.0 * alpha * math.sqrt(-math.log(recip_tol))
    nmax = int(math.ceil(k_cut * box / (2.0 * math.pi)))

    # Half-space enumeration (k and -k give identical |S(k)|^2 terms):
    # take nx > 0, or nx == 0 and ny > 0, or nx == ny == 0 and nz > 0.
    rng = np.arange(-nmax, nmax + 1)
    grid = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    nsq = np.sum(grid**2, axis=1)
    half = ((grid[:, 0] > 0)
            | ((grid[:, 0] == 0) & (grid[:, 1] > 0))
            | ((grid[:, 0] == 0) & (grid[:, 1] == 0) & (grid[:, 2] > 0)))
    keep = half & (nsq > 0) & (nsq <= nmax * nmax)
    kvecs = (2.0 * math.pi / box) * grid[keep].astype(np.float64)
    k2 = np.sum(kvecs**2, axis=1)
    vol = box**3
    # Factor 2 folds the -k partner into the half-space sum.
    kfac = 2.0 * (2.0 * math.pi / vol) * np.exp(-k2 / (4.0 * alpha**2)) / k2
    order = np.argsort(-kfac)  # largest terms first (helps f32 summation)
    return EwaldParams(alpha=alpha, cutoff=cutoff,
                       kvecs=kvecs[order], kfac=kfac[order],
                       coulomb_k=coulomb_k)


def recip_energy(sites, q, ew: EwaldParams):
    """Reciprocal-space (k-space) Ewald energy term alone [kJ/mol].

    This is the smooth, box-global component of the lattice sum — the part
    a short-cutoff local GNN cannot represent (round-4 finding: at the
    reference recipe the model memorizes it instead of generalizing,
    RESULTS.md TIP3P bullet). With fixed point charges it is ANALYTIC, so
    the framework can train the GNN on the short-range residual
    ``label - (-grad recip_energy)`` and add this term back at deployment
    (``ModelConfig.longrange``): a physics-informed split the reference
    (which trains directly on PME-containing labels,
    /root/reference/dataset/generate_tip3p_data.py:55-57) does not have.
    On TPU the term is one [K, N] matmul + cos/sin — MXU-friendly.
    """
    dtype = sites.dtype
    ke = jnp.asarray(ew.coulomb_k, dtype)
    kvecs = jnp.asarray(ew.kvecs, dtype)
    kfac = jnp.asarray(ew.kfac, dtype)
    phase = kvecs @ sites.T                          # [K, N]
    s_re = jnp.cos(phase) @ q                        # [K]
    s_im = jnp.sin(phase) @ q
    return ke * jnp.sum(kfac * (s_re**2 + s_im**2))


def make_recip_force_fn(box: float, q, cutoff: float = 10.0,
                        tolerance: float = 1.0e-5,
                        recip_tol: float = 1.0e-7):
    """Closure ``pos [N, 3] (angstrom) -> recip force [N, 3] (kJ/mol/A)``.

    The analytic long-range force channel used by GNNForceField when a
    checkpoint was trained with ``ModelConfig.longrange == 'ewald_recip'``.
    Differentiable and jit-compatible (fixed k-grid baked in as constants).
    """
    ew = make_ewald_params(box, cutoff, tolerance, recip_tol)
    q = jnp.asarray(q, jnp.float32)

    def force(pos):
        with jax.default_matmul_precision("highest"):
            return -jax.grad(lambda p: recip_energy(p, q, ew))(pos)
    return force


def ewald_energy(sites, q, box, same_mol, ew: EwaldParams):
    """Total Coulomb energy [kJ/mol] of charge sites in a periodic cubic box.

    sites     [N, 3] charge-site positions (may be derived/virtual sites —
              differentiate through them for force redistribution)
    q         [N] charges [e]
    same_mol  [N, N] bool, True for intra-molecular (excluded) pairs
              (diagonal value is ignored)
    """
    n = sites.shape[0]
    dtype = sites.dtype
    alpha = jnp.asarray(ew.alpha, dtype)
    ke = jnp.asarray(ew.coulomb_k, dtype)
    qq = q[:, None] * q[None, :]
    eye = jnp.eye(n, dtype=bool)

    d2 = space.pairwise_distance2(sites, box) + jnp.eye(n, dtype=dtype) * 1e9
    inter = (~same_mol) & (~eye)
    ok = inter & (d2 < ew.cutoff**2)
    r = jnp.sqrt(jnp.where(ok, d2, ew.cutoff**2))  # double-where NaN guard
    e_real = 0.5 * ke * jnp.sum(
        jnp.where(ok, qq * jax.scipy.special.erfc(alpha * r) / r, 0.0))

    # Reciprocal: S(k) via explicit cos/sin structure factors, [K, N] phases.
    e_recip = recip_energy(sites, q, ew)

    e_self = -ke * alpha / jnp.sqrt(jnp.asarray(jnp.pi, dtype)) \
        * jnp.sum(q * q)

    # Exclusion correction: the reciprocal sum included intra-molecular
    # pairs; subtract their full erf/r interaction (minimum-image — intra
    # distances are << box/2 so this is the true bond-frame distance).
    excl = same_mol & (~eye)
    r_x = jnp.sqrt(jnp.where(excl, d2, 1.0))
    e_excl = -0.5 * ke * jnp.sum(
        jnp.where(excl, qq * jax.scipy.special.erf(alpha * r_x) / r_x, 0.0))

    return e_real + e_recip + e_self + e_excl


def switched_lj_energy(d2, ok, sigma, eps, cutoff, switch_width):
    """OpenMM-style switched Lennard-Jones pair energies (summed).

    E(r) = 4 eps [ (s/r)^12 - (s/r)^6 ] * S(r), with S = 1 for
    r < rc - w and the quintic 1 - 10x^3 + 15x^4 - 6x^5,
    x = (r - (rc - w))/w, on the switching window (OpenMM
    NonbondedForce::setUseSwitchingFunction semantics). `d2` is the
    [M, M] squared-distance matrix, `ok` the pair-inclusion mask.
    """
    r2 = jnp.where(ok, d2, cutoff**2)
    r = jnp.sqrt(r2)
    inv6 = (sigma**2 / r2) ** 3
    e_pair = 4.0 * eps * (inv6**2 - inv6)
    r_on = cutoff - switch_width
    x = jnp.clip((r - r_on) / switch_width, 0.0, 1.0)
    s = 1.0 + x**3 * (-10.0 + x * (15.0 - 6.0 * x))
    return 0.5 * jnp.sum(jnp.where(ok, e_pair * s, 0.0))
