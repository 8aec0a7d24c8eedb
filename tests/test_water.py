"""Classical flexible-TIP3P water potential tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core import space, units
from gamd_tpu.physics import water as w


def test_water_box_geometry():
    pos = w.water_box(n_molecules=27, box=10.0, seed=0)
    assert pos.shape == (81, 3)
    assert np.all(pos >= 0) and np.all(pos < 10.0)
    # O-H distances at the ideal bond length.
    o = pos[0::3]
    h1 = pos[1::3]
    d = np.asarray(space.min_image(jnp.asarray(h1 - o), 10.0))
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 0.9572, atol=1e-3)


def test_monomer_is_energy_minimum():
    """A single ideal monomer has zero bond/angle forces."""
    p = w.TIP3PParams()
    pos = w.water_box(n_molecules=1, box=50.0, seed=1)
    f = np.asarray(w.tip3p_forces(jnp.asarray(pos), 50.0, p))
    # Only intra terms act (no other molecule): should vanish at equilibrium.
    assert np.abs(f).max() < 1.0


def test_bond_restoring_force():
    """Stretch one O-H bond: force pulls H back toward O."""
    p = w.TIP3PParams()
    pos = w.water_box(n_molecules=1, box=50.0, seed=2).copy()
    o, h1 = pos[0], pos[1]
    u = (h1 - o) / np.linalg.norm(h1 - o)
    pos[1] = o + u * (p.r_oh + 0.1)     # stretch by 0.1 A
    f = np.asarray(w.tip3p_forces(jnp.asarray(pos), 50.0, p))
    # Force on H points back along -u with magnitude ~ 2 k dr.
    proj = np.dot(f[1], u)
    assert proj == pytest.approx(-2 * p.k_bond * 0.1, rel=0.05)


def test_forces_are_gradient_consistent():
    """Numerical vs autodiff forces on a small random box."""
    p = w.TIP3PParams(cutoff=4.5)
    pos = w.water_box(n_molecules=8, box=10.0, seed=3)
    pos = jnp.asarray(pos)
    f = np.asarray(w.tip3p_forces(pos, 10.0, p))
    eps = 1e-3
    for (i, d) in [(0, 0), (4, 1), (10, 2)]:
        dp = np.zeros_like(np.asarray(pos))
        dp[i, d] = eps
        ep = float(w.tip3p_energy(pos + dp, 10.0, p))
        em = float(w.tip3p_energy(pos - dp, 10.0, p))
        f_num = -(ep - em) / (2 * eps)
        assert f[i, d] == pytest.approx(f_num, rel=0.05, abs=0.5)


def test_net_force_is_zero():
    """Translation invariance: forces sum to ~0."""
    p = w.TIP3PParams(cutoff=4.5)
    pos = jnp.asarray(w.water_box(n_molecules=12, box=10.0, seed=4))
    f = np.asarray(w.tip3p_forces(pos, 10.0, p))
    np.testing.assert_allclose(f.sum(axis=0), 0.0, atol=0.3)


def test_charges_neutral():
    q = np.asarray(w.atom_charges(5, w.TIP3PParams()))
    assert q.sum() == pytest.approx(0.0, abs=1e-6)
    assert q[0] == pytest.approx(-0.834)


def test_short_water_md_stable():
    """100 NVE-ish steps at 0.5 fs stay finite with sane temperature."""
    from gamd_tpu.core.config import MDConfig, SystemConfig
    from gamd_tpu.md.simulate import Simulation
    from gamd_tpu.physics.minimize import fire_minimize

    p = w.TIP3PParams(cutoff=4.0)
    n_mol = 16
    box = 8.0
    pos = w.water_box(n_molecules=n_mol, box=box, seed=5)
    force = lambda x: w.tip3p_forces(x, box, p)
    pos, _ = fire_minimize(force, jnp.asarray(pos), n_steps=300,
                           max_step=0.05)
    system = SystemConfig(
        name="tiny-water", n_atoms=3 * n_mol, box=box, cutoff=p.cutoff,
        nbr_capacity=3 * n_mol, skin=0.5, species="water", has_bonds=True,
        masses=w.WATER_MASSES, temperature=300.0)
    md = MDConfig(integrator="langevin", temperature=300.0, dt_fs=0.5,
                  friction_per_ps=5.0, rebuild_every=10)
    sim = Simulation(w.tip3p_force_fn(box, p), system, md)
    st = sim.init_state(pos, rng=jax.random.PRNGKey(6))
    res = sim.run(st, 100)
    assert bool(jnp.isfinite(res.state.pos).all())
    temps = np.asarray(res.thermo.temperature)
    assert np.all(np.isfinite(temps))
    assert temps[-1] < 3000.0   # not exploding


# ------------------------------------------------------------- TIP4P-Ew ----

def test_tip4pew_m_site_geometry():
    """M lies on the HOH bisector at r_om from O."""
    p = w.TIP4PEwParams()
    pos = w.water_box(n_molecules=1, box=50.0, seed=7)
    o, h1, h2 = (jnp.asarray(pos[0::3]), jnp.asarray(pos[1::3]),
                 jnp.asarray(pos[2::3]))
    m = np.asarray(w.tip4pew_m_sites(o, h1, h2, 50.0, p))
    d_om = np.linalg.norm(m[0] - np.asarray(o)[0])
    assert d_om == pytest.approx(p.r_om, rel=1e-4)
    # Equidistant from both H.
    d1 = np.linalg.norm(m[0] - np.asarray(h1)[0])
    d2 = np.linalg.norm(m[0] - np.asarray(h2)[0])
    assert d1 == pytest.approx(d2, rel=1e-4)


def test_tip4pew_forces_gradient_consistent():
    p = w.TIP4PEwParams(cutoff=4.5)
    pos = jnp.asarray(w.water_box(n_molecules=8, box=10.0, seed=8))
    f = np.asarray(w.tip4pew_forces(pos, 10.0, p))
    assert np.all(np.isfinite(f))
    eps = 1e-3
    for (i, d) in [(0, 0), (7, 2)]:
        dp = np.zeros_like(np.asarray(pos))
        dp[i, d] = eps
        ep = float(w.tip4pew_energy(pos + dp, 10.0, p))
        em = float(w.tip4pew_energy(pos - dp, 10.0, p))
        f_num = -(ep - em) / (2 * eps)
        assert f[i, d] == pytest.approx(f_num, rel=0.05, abs=0.5)


def test_tip4pew_expand_with_m_sites():
    p = w.TIP4PEwParams()
    pos = w.water_box(n_molecules=2, box=20.0, seed=9)
    forces = np.random.RandomState(0).randn(6, 3).astype(np.float32)
    pos4, f4 = w.expand_with_m_sites(pos, forces, 20.0, p)
    assert pos4.shape == (8, 3) and f4.shape == (8, 3)
    # Rows 0-2 are O,H,H; row 3 is M with zero force.
    np.testing.assert_array_equal(pos4[:3], pos[:3])
    np.testing.assert_array_equal(f4[3], 0.0)
    np.testing.assert_array_equal(f4[:3], forces[:3])
    # Round-trip through the reference's M-site dropping recovers atoms.
    keep = np.arange(8) % 4 < 3
    np.testing.assert_array_equal(pos4[keep], pos)
