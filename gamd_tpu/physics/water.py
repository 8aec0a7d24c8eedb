"""Classical TIP3P / TIP4P-Ew water potentials for ground-truth generation.

First-party replacement for the OpenMM WaterBox testsystems the reference
uses to produce TIP3P/TIP4P-Ew training data (reference:
/root/reference/dataset/generate_tip3p_data.py:55-78). Two variants:

  * RIGID (tip3p_energy_rigid / tip4pew_energy_rigid): nonbonded terms only;
    the monomer geometry is enforced by SETTLE constraints
    (gamd_tpu.md.constraints) at dt = 2 fs — the reference's protocol
    (OpenMM WaterBox constrains all O-H/H-H distances). This is the default
    for dataset generation: recorded forces contain no intramolecular
    terms, exactly like OpenMM's getForces on rigid water.
  * FLEXIBLE (tip3p_energy / tip4pew_energy): adds stiff harmonic bonds and
    angles (CHARMM-style), a plain differentiable potential needing
    dt = 0.5 fs.

Nonbonded terms (atoms ordered O,H,H per molecule):
  * LJ on O-O pairs:      TIP3P/TIP4P-Ew sigma/epsilon
  * Coulomb (on O,H for TIP3P; on derived M,H sites for TIP4P-Ew) with the
    damped-shifted-force (alpha=0) cutoff scheme, which keeps both energy
    and force continuous at the cutoff; intra-molecular pairs excluded.

Units: kJ/mol, angstrom.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gamd_tpu.core import space, units
from gamd_tpu.physics import ewald as _ewald


class TIP3PParams(NamedTuple):
    r_oh: float = 0.9572
    k_bond: float = 450.0 * units.KCAL_TO_KJ          # kJ/mol/A^2
    theta0: float = 104.52 * np.pi / 180.0
    k_angle: float = 55.0 * units.KCAL_TO_KJ          # kJ/mol/rad^2
    sigma_o: float = 3.15061
    eps_o: float = 0.1521 * units.KCAL_TO_KJ
    q_o: float = -0.834
    q_h: float = 0.417
    cutoff: float = 9.0
    coulomb_k: float = 332.0637128 * units.KCAL_TO_KJ  # kJ mol^-1 A e^-2


WATER_MASSES = (15.9994, 1.008, 1.008)


def atom_charges(n_molecules, p: TIP3PParams):
    return jnp.tile(jnp.array([p.q_o, p.q_h, p.q_h]), n_molecules)


def _tip3p_intra_energy(pos, box, params: TIP3PParams):
    """Harmonic bond + angle energy (the FLEXIBLE-variant intra terms)."""
    p = params
    o = pos[0::3]
    h1 = pos[1::3]
    h2 = pos[2::3]

    # Bonds.
    d1 = jnp.sqrt(jnp.sum(space.min_image(h1 - o, box) ** 2, -1) + 1e-12)
    d2 = jnp.sqrt(jnp.sum(space.min_image(h2 - o, box) ** 2, -1) + 1e-12)
    e_bond = jnp.sum(p.k_bond * ((d1 - p.r_oh) ** 2 + (d2 - p.r_oh) ** 2))

    # Angles.
    v1 = space.min_image(h1 - o, box)
    v2 = space.min_image(h2 - o, box)
    cos_t = jnp.sum(v1 * v2, -1) / jnp.maximum(
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), 1e-8)
    theta = jnp.arccos(jnp.clip(cos_t, -1 + 1e-7, 1 - 1e-7))
    e_angle = jnp.sum(p.k_angle * (theta - p.theta0) ** 2)
    return e_bond + e_angle


def tip3p_energy(pos, box, params: TIP3PParams = TIP3PParams()):
    """Total FLEXIBLE potential energy of an N = 3M atom box [kJ/mol]
    (stiff harmonic bonds/angles + nonbonded)."""
    return _tip3p_intra_energy(pos, box, params) \
        + tip3p_energy_rigid(pos, box, params)


def tip3p_energy_rigid(pos, box, params: TIP3PParams = TIP3PParams()):
    """Nonbonded-only TIP3P energy — the potential of RIGID water, where
    bond/angle terms are replaced by holonomic constraints. This is what
    the reference's ground-truth forces contain (OpenMM rigid TIP3P has no
    intramolecular force terms; generate_tip3p_data.py:55-78), so datasets
    generated with this potential + SETTLE are apples-to-apples with the
    upstream water results."""
    n = pos.shape[0]
    assert n % 3 == 0
    m = n // 3
    p = params

    # Nonbonded: all pairs, same-molecule excluded.
    mol = jnp.arange(n) // 3
    same_mol = mol[:, None] == mol[None, :]
    d2_all = space.pairwise_distance2(pos, box) + jnp.eye(n) * 1e9
    pair_ok = (~same_mol) & (d2_all < p.cutoff**2)
    r2 = jnp.where(pair_ok, d2_all, p.cutoff**2)   # double-where NaN guard
    r = jnp.sqrt(r2)

    # LJ on O-O only.
    is_o = (jnp.arange(n) % 3) == 0
    oo = is_o[:, None] & is_o[None, :]
    inv6 = (p.sigma_o**2 / r2) ** 3
    s6 = (p.sigma_o / p.cutoff) ** 6
    e_lj_pair = 4 * p.eps_o * (inv6**2 - inv6) - 4 * p.eps_o * (s6**2 - s6)
    e_lj = 0.5 * jnp.sum(jnp.where(pair_ok & oo, e_lj_pair, 0.0))

    # Coulomb, damped-shifted-force: continuous energy AND force at rc.
    q = atom_charges(m, p)
    qq = q[:, None] * q[None, :]
    rc = p.cutoff
    e_c_pair = p.coulomb_k * qq * (1.0 / r - 1.0 / rc + (r - rc) / rc**2)
    e_coul = 0.5 * jnp.sum(jnp.where(pair_ok, e_c_pair, 0.0))

    return e_lj + e_coul


def tip3p_energy_rigid_ewald(pos, box, ew: _ewald.EwaldParams,
                             params: TIP3PParams = TIP3PParams(),
                             switch_width: float = 1.5):
    """Nonbonded rigid-TIP3P energy under the REFERENCE PROTOCOL: full
    Ewald electrostatics + switched LJ, matching the openmmtools WaterBox
    defaults the reference generates data with (PME, cutoff 10 A, Ewald
    error tolerance 1e-5, LJ switch width 1.5 A — reference:
    /root/reference/dataset/generate_tip3p_data.py:55-57). The DSF variant
    (tip3p_energy_rigid) truncates the lattice sum and is kept for
    continuity with rounds 1-3 datasets."""
    n = pos.shape[0]
    assert n % 3 == 0
    m = n // 3
    p = params

    # LJ on O-O, switched over [cutoff - w, cutoff].
    o = pos[0::3]
    d2_oo = space.pairwise_distance2(o, box) + jnp.eye(m) * 1e9
    ok_oo = d2_oo < ew.cutoff**2
    e_lj = _ewald.switched_lj_energy(d2_oo, ok_oo, p.sigma_o, p.eps_o,
                                     ew.cutoff, switch_width)

    q = atom_charges(m, p)
    mol = jnp.arange(n) // 3
    same_mol = mol[:, None] == mol[None, :]
    return e_lj + _ewald.ewald_energy(pos, q, box, same_mol, ew)


def tip3p_energy_ewald(pos, box, ew, params: TIP3PParams = TIP3PParams()):
    """FLEXIBLE TIP3P under the reference protocol (harmonic intra terms +
    Ewald nonbonded) — used only for minimization in generation."""
    return _tip3p_intra_energy(pos, box, params) \
        + tip3p_energy_rigid_ewald(pos, box, ew, params)


def tip3p_forces(pos, box, params: TIP3PParams = TIP3PParams()):
    return -jax.grad(tip3p_energy)(pos, box, params)


def tip3p_forces_rigid(pos, box, params: TIP3PParams = TIP3PParams()):
    return -jax.grad(tip3p_energy_rigid)(pos, box, params)


def tip3p_force_fn(box, params: TIP3PParams = TIP3PParams(),
                   rigid: bool = False, electrostatics: str = "dsf"):
    """Dense force closure for the Simulation driver (ignores the padded
    neighbor list — at N<=774 the dense pair matrix is the fast path).
    electrostatics="ewald" selects the reference-protocol potential."""
    if electrostatics == "ewald":
        ew = _ewald.make_ewald_params(box)
        energy = tip3p_energy_rigid_ewald if rigid else tip3p_energy_ewald

        def force(pos, idx, mask):
            del idx, mask
            return -jax.grad(energy)(pos, box, ew, params)
        return force
    fwd = tip3p_forces_rigid if rigid else tip3p_forces

    def force(pos, idx, mask):
        del idx, mask
        return fwd(pos, box, params)
    return force


def water_box(n_molecules: int = 258, box: float = 20.0,
              params: TIP3PParams = TIP3PParams(), seed: int = 0):
    """Initial configuration: molecules on a cubic grid with random
    orientations (the analogue of openmmtools WaterBox(box_edge=2nm))."""
    rng = np.random.RandomState(seed)
    per_dim = 1
    while per_dim**3 < n_molecules:
        per_dim += 1
    spacing = box / per_dim
    sites = np.array([(i, j, k) for i in range(per_dim)
                      for j in range(per_dim) for k in range(per_dim)],
                     np.float32)
    sel = np.round(np.linspace(0, len(sites) - 1, n_molecules)).astype(int)
    centers = (sites[sel] + 0.5) * spacing

    # Ideal monomer geometry, then random rotation per molecule.
    t0 = params.theta0
    local = np.array([
        [0.0, 0.0, 0.0],
        [params.r_oh * np.sin(t0 / 2), params.r_oh * np.cos(t0 / 2), 0.0],
        [-params.r_oh * np.sin(t0 / 2), params.r_oh * np.cos(t0 / 2), 0.0],
    ], np.float32)

    frames = []
    for c in centers:
        a, b, g = rng.uniform(0, 2 * np.pi, 3)
        ca, sa, cb, sb, cg, sg = (np.cos(a), np.sin(a), np.cos(b),
                                  np.sin(b), np.cos(g), np.sin(g))
        rz = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]])
        ry = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
        rz2 = np.array([[cg, -sg, 0], [sg, cg, 0], [0, 0, 1]])
        rot = (rz @ ry @ rz2).astype(np.float32)
        frames.append(local @ rot.T + c)
    pos = np.concatenate(frames, axis=0)
    return np.mod(pos, box).astype(np.float32)


# ---------------------------------------------------------------------------
# TIP4P-Ew (4-site: O,H,H,M with the charge on the virtual M site)
# ---------------------------------------------------------------------------

class TIP4PEwParams(NamedTuple):
    r_oh: float = 0.9572
    k_bond: float = 450.0 * units.KCAL_TO_KJ
    theta0: float = 104.52 * np.pi / 180.0
    k_angle: float = 55.0 * units.KCAL_TO_KJ
    sigma_o: float = 3.16435
    eps_o: float = 0.16275 * units.KCAL_TO_KJ
    q_m: float = -1.04844
    q_h: float = 0.52422
    r_om: float = 0.125           # M along the HOH bisector
    cutoff: float = 9.0
    coulomb_k: float = 332.0637128 * units.KCAL_TO_KJ


def tip4pew_m_sites(o, h1, h2, box, p):
    """Virtual-site positions: O + r_om * unit(bisector). Differentiable, so
    grad redistributes M-site Coulomb forces onto O/H automatically — the
    autodiff equivalent of OpenMM's virtual-site force projection."""
    b = space.min_image(h1 - o, box) + space.min_image(h2 - o, box)
    b_norm = jnp.linalg.norm(b, axis=-1, keepdims=True)
    return o + p.r_om * b / jnp.maximum(b_norm, 1e-8)


def tip4p_charge_sites(pos, box, p: TIP4PEwParams):
    """Derived charge sites + charges for the 4-site model:
    ``[N, 3] real atoms (O,H,H) -> ([N, 3] sites (M,H,H), [N] charges)``.
    Single source of the site layout / charge ordering for the energy,
    Ewald, and long-range-channel paths."""
    m = pos.shape[0] // 3
    o, h1, h2 = pos[0::3], pos[1::3], pos[2::3]
    msite = tip4pew_m_sites(o, h1, h2, box, p)
    sites = jnp.stack([msite, h1, h2], axis=1).reshape(3 * m, 3)
    q = jnp.tile(jnp.array([p.q_m, p.q_h, p.q_h]), m)
    return sites, q


def tip4pew_energy(pos, box, params: TIP4PEwParams = TIP4PEwParams()):
    """FLEXIBLE TIP4P-Ew energy (harmonic intra terms + nonbonded)."""
    p = params
    o = pos[0::3]
    h1 = pos[1::3]
    h2 = pos[2::3]

    d1 = jnp.sqrt(jnp.sum(space.min_image(h1 - o, box) ** 2, -1) + 1e-12)
    d2 = jnp.sqrt(jnp.sum(space.min_image(h2 - o, box) ** 2, -1) + 1e-12)
    e_bond = jnp.sum(p.k_bond * ((d1 - p.r_oh) ** 2 + (d2 - p.r_oh) ** 2))

    v1 = space.min_image(h1 - o, box)
    v2 = space.min_image(h2 - o, box)
    cos_t = jnp.sum(v1 * v2, -1) / jnp.maximum(
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), 1e-8)
    theta = jnp.arccos(jnp.clip(cos_t, -1 + 1e-7, 1 - 1e-7))
    e_angle = jnp.sum(p.k_angle * (theta - p.theta0) ** 2)

    return e_bond + e_angle + tip4pew_energy_rigid(pos, box, params)


def tip4pew_energy_rigid(pos, box, params: TIP4PEwParams = TIP4PEwParams()):
    """Nonbonded-only TIP4P-Ew energy (rigid-water potential): LJ on O-O +
    Coulomb between derived M/H charge sites. Gradients redistribute the
    M-site forces onto the real atoms automatically (see tip4pew_m_sites).
    """
    n = pos.shape[0]
    assert n % 3 == 0
    m = n // 3
    p = params
    o = pos[0::3]

    # LJ on O-O.
    d2_oo = space.pairwise_distance2(o, box) + jnp.eye(m) * 1e9
    ok_oo = d2_oo < p.cutoff**2
    r2_oo = jnp.where(ok_oo, d2_oo, p.cutoff**2)
    inv6 = (p.sigma_o**2 / r2_oo) ** 3
    s6 = (p.sigma_o / p.cutoff) ** 6
    e_lj_pair = 4 * p.eps_o * (inv6**2 - inv6) - 4 * p.eps_o * (s6**2 - s6)
    e_lj = 0.5 * jnp.sum(jnp.where(ok_oo, e_lj_pair, 0.0))

    # Coulomb between charge sites M,H1,H2 of different molecules.
    sites, q = tip4p_charge_sites(pos, box, p)
    mol = jnp.arange(3 * m) // 3
    same = mol[:, None] == mol[None, :]
    d2_s = space.pairwise_distance2(sites, box) + jnp.eye(3 * m) * 1e9
    ok = (~same) & (d2_s < p.cutoff**2)
    r = jnp.sqrt(jnp.where(ok, d2_s, p.cutoff**2))
    rc = p.cutoff
    qq = q[:, None] * q[None, :]
    e_c = p.coulomb_k * qq * (1.0 / r - 1.0 / rc + (r - rc) / rc**2)
    e_coul = 0.5 * jnp.sum(jnp.where(ok, e_c, 0.0))

    return e_lj + e_coul


def tip4pew_energy_rigid_ewald(pos, box, ew: _ewald.EwaldParams,
                               params: TIP4PEwParams = TIP4PEwParams(),
                               switch_width: float = 1.5):
    """Rigid TIP4P-Ew under the reference protocol: full Ewald on the
    derived M/H charge sites + switched O-O LJ (openmmtools WaterBox
    model='tip4pew' defaults — reference: generate_tip4p_data.py:57).
    Gradients redistribute M-site forces onto the real atoms (see
    tip4pew_m_sites)."""
    n = pos.shape[0]
    assert n % 3 == 0
    m = n // 3
    p = params
    o = pos[0::3]

    d2_oo = space.pairwise_distance2(o, box) + jnp.eye(m) * 1e9
    ok_oo = d2_oo < ew.cutoff**2
    e_lj = _ewald.switched_lj_energy(d2_oo, ok_oo, p.sigma_o, p.eps_o,
                                     ew.cutoff, switch_width)

    sites, q = tip4p_charge_sites(pos, box, p)
    mol = jnp.arange(3 * m) // 3
    same_mol = mol[:, None] == mol[None, :]
    return e_lj + _ewald.ewald_energy(sites, q, box, same_mol, ew)


def tip4pew_energy_ewald(pos, box, ew,
                         params: TIP4PEwParams = TIP4PEwParams()):
    """FLEXIBLE TIP4P-Ew under the reference protocol (minimization only)."""
    p = params
    o = pos[0::3]
    h1 = pos[1::3]
    h2 = pos[2::3]
    d1 = jnp.sqrt(jnp.sum(space.min_image(h1 - o, box) ** 2, -1) + 1e-12)
    d2 = jnp.sqrt(jnp.sum(space.min_image(h2 - o, box) ** 2, -1) + 1e-12)
    e_bond = jnp.sum(p.k_bond * ((d1 - p.r_oh) ** 2 + (d2 - p.r_oh) ** 2))
    v1 = space.min_image(h1 - o, box)
    v2 = space.min_image(h2 - o, box)
    cos_t = jnp.sum(v1 * v2, -1) / jnp.maximum(
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), 1e-8)
    theta = jnp.arccos(jnp.clip(cos_t, -1 + 1e-7, 1 - 1e-7))
    e_angle = jnp.sum(p.k_angle * (theta - p.theta0) ** 2)
    return e_bond + e_angle + tip4pew_energy_rigid_ewald(pos, box, ew, params)


def make_tip4p_recip_force_fn(box: float, n_atoms: int,
                              params: TIP4PEwParams = TIP4PEwParams(),
                              cutoff: float = 10.0,
                              tolerance: float = 1.0e-5,
                              recip_tol: float = 1.0e-7):
    """Analytic k-space Ewald force on REAL atoms for TIP4P-Ew
    (``pos [N, 3] angstrom -> [N, 3] kJ/mol/A``).

    The charges live on the derived M/H sites; differentiating through
    ``tip4pew_m_sites`` redistributes the M-site reciprocal force onto
    O/H exactly like the full oracle does. Long-range channel counterpart
    of ewald.make_recip_force_fn for the 4-site model
    (ModelConfig.longrange == 'ewald_recip' on the tip4p preset)."""
    assert n_atoms % 3 == 0
    ew = _ewald.make_ewald_params(box, cutoff, tolerance, recip_tol)
    p = params

    def energy(pos):
        sites, q = tip4p_charge_sites(pos, box, p)
        return _ewald.recip_energy(sites, q, ew)

    def force(pos):
        with jax.default_matmul_precision("highest"):
            return -jax.grad(energy)(pos)
    return force


def tip4pew_forces(pos, box, params: TIP4PEwParams = TIP4PEwParams()):
    return -jax.grad(tip4pew_energy)(pos, box, params)


def tip4pew_forces_rigid(pos, box, params: TIP4PEwParams = TIP4PEwParams()):
    return -jax.grad(tip4pew_energy_rigid)(pos, box, params)


def tip4pew_force_fn(box, params: TIP4PEwParams = TIP4PEwParams(),
                     rigid: bool = False, electrostatics: str = "dsf"):
    if electrostatics == "ewald":
        ew = _ewald.make_ewald_params(box)
        energy = tip4pew_energy_rigid_ewald if rigid else tip4pew_energy_ewald

        def force(pos, idx, mask):
            del idx, mask
            return -jax.grad(energy)(pos, box, ew, params)
        return force
    fwd = tip4pew_forces_rigid if rigid else tip4pew_forces

    def force(pos, idx, mask):
        del idx, mask
        return fwd(pos, box, params)
    return force


def expand_with_m_sites(pos, forces, box, params: TIP4PEwParams):
    """Emit the reference's 4-site frame layout (O,H,H,M per molecule,
    generate_tip4p_data.py records all sites; the loader drops M rows,
    train_utils.py:58-64). M rows carry the derived position and zero force."""
    m = pos.shape[0] // 3
    o, h1, h2 = pos[0::3], pos[1::3], pos[2::3]
    msite = np.asarray(tip4pew_m_sites(
        jnp.asarray(o), jnp.asarray(h1), jnp.asarray(h2), box, params))
    pos4 = np.stack([o, h1, h2, msite], axis=1).reshape(4 * m, 3)
    f = forces.reshape(m, 3, 3)
    f4 = np.concatenate([f, np.zeros((m, 1, 3), f.dtype)], axis=1)
    return pos4.astype(np.float32), f4.reshape(4 * m, 3).astype(np.float32)
