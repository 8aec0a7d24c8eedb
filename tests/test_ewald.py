"""Correctness tests for the first-party Ewald sum (physics/ewald.py).

The reference's water ground truth uses OpenMM PME
(/root/reference/dataset/generate_tip3p_data.py:55-57 via openmmtools
WaterBox defaults); plain Ewald at matched tolerance is the exact version
of that physics. These tests pin the implementation against analytically
known values (Madelung constant), internal-consistency invariants
(independence of the splitting parameter alpha), and force-field sanity
(zero net force, translation invariance, exclusion handling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.physics import ewald
from gamd_tpu.physics import water as w


@pytest.fixture(autouse=True)
def _x64():
    """f64 for these physics-accuracy tests only (restored afterwards)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


def _nacl_config(cells=1):
    """Rock-salt lattice: unit cube side 2 with 8 alternating unit charges,
    nearest-neighbor distance 1."""
    box = 2.0 * cells
    coords, charges = [], []
    for i in range(2 * cells):
        for j in range(2 * cells):
            for k in range(2 * cells):
                coords.append((i, j, k))
                charges.append(1.0 if (i + j + k) % 2 == 0 else -1.0)
    return (jnp.asarray(np.array(coords, np.float64)),
            jnp.asarray(np.array(charges, np.float64)), box)


def test_madelung_constant():
    """E_total / N = -M_NaCl / 2 per ion (k_e = q = r_nn = 1):
    the classical absolute-correctness benchmark for Ewald codes."""
    pos, q, box = _nacl_config()
    ew = ewald.make_ewald_params(box, cutoff=0.99, tolerance=1e-6,
                                 recip_tol=1e-9, coulomb_k=1.0)
    same_mol = jnp.zeros((8, 8), bool)
    e = float(ewald.ewald_energy(pos, q, box, same_mol, ew))
    madelung = 1.747564594633
    assert e / 8 == pytest.approx(-madelung / 2, rel=5e-5)


def test_alpha_invariance():
    """The Ewald total must not depend on the real/reciprocal split.
    Different tolerances give different alphas; totals must agree."""
    rng = np.random.RandomState(0)
    box = 12.0
    n = 30
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
    q = rng.uniform(-1, 1, n)
    q -= q.mean()  # neutral
    q = jnp.asarray(q)
    mol = jnp.arange(n) // 3
    same_mol = mol[:, None] == mol[None, :]

    es = []
    for tol in (1e-4, 1e-5, 1e-6):
        ew = ewald.make_ewald_params(box, cutoff=5.9, tolerance=tol,
                                     recip_tol=1e-10, coulomb_k=1.0)
        es.append(float(ewald.ewald_energy(pos, q, box, same_mol, ew)))
    assert es[0] == pytest.approx(es[2], rel=2e-4)
    assert es[1] == pytest.approx(es[2], rel=2e-5)


def test_matches_direct_lattice_sum_neutral_cluster():
    """A well-separated neutral molecule interacting with its own periodic
    images: Ewald must match an explicit real-space image sum (which
    converges absolutely for neutral molecules)."""
    box = 10.0
    # One 3-site 'water-like' neutral molecule.
    pos = jnp.asarray(np.array([[5.0, 5.0, 5.0],
                                [5.8, 5.6, 5.0],
                                [4.2, 5.6, 5.0]], np.float64))
    q = jnp.asarray(np.array([-0.8, 0.4, 0.4], np.float64))
    same_mol = jnp.ones((3, 3), bool)  # single molecule: all excluded
    ew = ewald.make_ewald_params(box, cutoff=4.9, tolerance=1e-6,
                                 recip_tol=1e-10, coulomb_k=1.0)
    e_ewald = float(ewald.ewald_energy(pos, q, box, same_mol, ew))

    # Direct sum over image shells (intra-cell pairs excluded, image
    # self-interactions at n != 0 included with the 1/2 factor).
    p = np.asarray(pos)
    qn = np.asarray(q)
    e_direct = 0.0
    shells = 14
    for nx in range(-shells, shells + 1):
        for ny in range(-shells, shells + 1):
            for nz in range(-shells, shells + 1):
                shift = np.array([nx, ny, nz], np.float64) * box
                if nx == ny == nz == 0:
                    continue
                d = np.linalg.norm(p[:, None] - p[None] - shift, axis=-1)
                e_direct += 0.5 * np.sum(qn[:, None] * qn[None] / d)
    # The cube-truncated direct sum converges to the VACUUM boundary
    # condition, which exceeds Ewald's tinfoil (conducting) result by the
    # surface term 2 pi |M|^2 / (3 V) (a cube's depolarization factor is
    # 1/3, same as a sphere's).
    dipole = (qn[:, None] * p).sum(0)
    e_direct_tinfoil = e_direct - 2 * np.pi * np.dot(dipole, dipole) \
        / (3 * box**3)
    assert e_ewald == pytest.approx(e_direct_tinfoil, abs=5e-5)


def test_forces_zero_net_and_translation_invariant():
    rng = np.random.RandomState(1)
    box = 15.0
    m = 8
    pos = jnp.asarray(rng.uniform(0, box, (3 * m, 3)))
    q = w.atom_charges(m, w.TIP3PParams()).astype(jnp.float64)
    mol = jnp.arange(3 * m) // 3
    same_mol = mol[:, None] == mol[None, :]
    ew = ewald.make_ewald_params(box, cutoff=7.0, tolerance=1e-5,
                                 recip_tol=1e-8)

    grad = jax.grad(ewald.ewald_energy)(pos, q, box, same_mol, ew)
    assert float(jnp.abs(grad.sum(0)).max()) < 1e-8

    e0 = float(ewald.ewald_energy(pos, q, box, same_mol, ew))
    e1 = float(ewald.ewald_energy(pos + 1.2345, q, box, same_mol, ew))
    assert e0 == pytest.approx(e1, rel=1e-10)


def test_tip3p_ewald_energy_and_forces_finite():
    """Rigid TIP3P Ewald potential on a liquid-like box: finite energy,
    zero net force, and distinguishable from the DSF truncation (the whole
    point of the protocol fix)."""
    m = 32
    box = 10.0
    pos = jnp.asarray(w.water_box(m, box, seed=3).astype(np.float64))
    ew = ewald.make_ewald_params(box, cutoff=4.9)
    e = float(w.tip3p_energy_rigid_ewald(pos, box, ew))
    assert np.isfinite(e)
    f = -jax.grad(w.tip3p_energy_rigid_ewald)(pos, box, ew)
    assert bool(jnp.all(jnp.isfinite(f)))
    assert float(jnp.abs(f.sum(0)).max()) < 1e-6
    e_dsf = float(w.tip3p_energy_rigid(pos, box,
                                       w.TIP3PParams(cutoff=4.9)))
    assert abs(e - e_dsf) > 1.0  # different potentials


def test_tip4pew_ewald_msite_force_redistribution():
    """TIP4P-Ew Ewald forces act on real atoms only (autodiff projects the
    M-site force through the virtual-site definition); net force zero."""
    m = 16
    box = 9.0
    pos = jnp.asarray(
        w.water_box(m, box, w.TIP3PParams(
            r_oh=w.TIP4PEwParams().r_oh,
            theta0=w.TIP4PEwParams().theta0), seed=4).astype(np.float64))
    ew = ewald.make_ewald_params(box, cutoff=4.4)
    f = -jax.grad(w.tip4pew_energy_rigid_ewald)(pos, box, ew)
    assert f.shape == (3 * m, 3)
    assert bool(jnp.all(jnp.isfinite(f)))
    assert float(jnp.abs(f.sum(0)).max()) < 1e-6


def test_switched_lj_matches_plain_below_switch_window():
    box = 20.0
    sigma, eps, rc, wdt = 3.15, 0.6, 10.0, 1.5
    # Two particles below the switch-on radius: switched == plain LJ.
    for r in (3.0, 5.0, 8.49):
        pos = jnp.asarray([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])
        from gamd_tpu.core import space
        d2 = space.pairwise_distance2(pos, box) + jnp.eye(2) * 1e9
        ok = d2 < rc**2
        e = float(ewald.switched_lj_energy(d2, ok, sigma, eps, rc, wdt))
        plain = float(4 * eps * ((sigma / r) ** 12 - (sigma / r) ** 6))
        assert e == pytest.approx(plain, rel=1e-12)
    # At the cutoff the switched energy vanishes (continuously).
    pos = jnp.asarray([[0.0, 0.0, 0.0], [9.999, 0.0, 0.0]])
    from gamd_tpu.core import space
    d2 = space.pairwise_distance2(pos, box) + jnp.eye(2) * 1e9
    ok = d2 < rc**2
    e = float(ewald.switched_lj_energy(d2, ok, sigma, eps, rc, wdt))
    assert abs(e) < 1e-10
