"""SETTLE/RATTLE rigid-water constraint tests.

Covers the reference's rigid-water protocol (OpenMM constraints at dt=2fs,
/root/reference/dataset/generate_tip3p_data.py:55-78) re-built as analytic
SETTLE: closed-form projection vs the iterative SHAKE oracle, conservation
properties, constrained integrator stability, and the on-device recorded
generation path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core import units
from gamd_tpu.core.config import MDConfig, get_preset
from gamd_tpu.md import integrators as integ
from gamd_tpu.md.constraints import (
    RigidWater,
    _canonical_triangle,
    rattle_velocities,
    settle,
    shake,
    tip3p_rigid_params,
)
from gamd_tpu.md.simulate import Simulation
from gamd_tpu.physics import water as w

P = tip3p_rigid_params()
PAIRS = ((0, 1), (0, 2), (1, 2))


def _rand_rigid_molecules(m, rng, spread=5.0):
    """[M,3,3] exactly-rigid molecules at random orientations/positions."""
    ra, rb, rc = _canonical_triangle(P)
    can = np.array([[0, ra, 0], [-rc, -rb, 0], [rc, -rb, 0]])
    out = []
    for _ in range(m):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        a, b, c, d = q
        rot = np.array([
            [1 - 2 * (c * c + d * d), 2 * (b * c - a * d), 2 * (b * d + a * c)],
            [2 * (b * c + a * d), 1 - 2 * (b * b + d * d), 2 * (c * d - a * b)],
            [2 * (b * d - a * c), 2 * (c * d + a * b), 1 - 2 * (b * b + c * c)],
        ])
        out.append(can @ rot.T + rng.randn(3) * spread)
    return np.stack(out)


def _residuals(x):
    d_oh1 = np.linalg.norm(x[:, 1] - x[:, 0], axis=-1)
    d_oh2 = np.linalg.norm(x[:, 2] - x[:, 0], axis=-1)
    d_hh = np.linalg.norm(x[:, 2] - x[:, 1], axis=-1)
    return max(np.abs(d_oh1 - P.d_oh).max(), np.abs(d_oh2 - P.d_oh).max(),
               np.abs(d_hh - P.d_hh).max())


def test_settle_exact_in_f64():
    """The closed-form algorithm is exact: residual < 1e-9 A in float64
    (fp32 MD sits at its ~1e-6 representation floor instead)."""
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.RandomState(11)
        old = _rand_rigid_molecules(32, rng)
        new = old + rng.randn(32, 3, 3) * 0.05
        out = np.asarray(settle(jnp.asarray(old, jnp.float64),
                                jnp.asarray(new, jnp.float64), P))
        assert _residuals(out) < 1e-9
    finally:
        jax.config.update("jax_enable_x64", False)


def test_settle_matches_shake_oracle():
    rng = np.random.RandomState(0)
    old = _rand_rigid_molecules(32, rng)
    new = old + rng.randn(32, 3, 3) * 0.05       # ~dt*v displacement scale
    out_settle = np.asarray(settle(jnp.asarray(old), jnp.asarray(new), P))
    out_shake = np.asarray(shake(jnp.asarray(old), jnp.asarray(new), P, 400))
    assert _residuals(out_settle) < 1e-6
    np.testing.assert_allclose(out_settle, out_shake, atol=5e-6)


def test_settle_preserves_com_and_fixes_constraints():
    rng = np.random.RandomState(1)
    old = _rand_rigid_molecules(16, rng)
    new = old + rng.randn(16, 3, 3) * 0.1
    out = np.asarray(settle(jnp.asarray(old), jnp.asarray(new), P))
    assert _residuals(out) < 1e-5
    m = np.array([P.m_o, P.m_h, P.m_h])[:, None]
    com_free = (new * m).sum(1) / m.sum()
    com_proj = (out * m).sum(1) / m.sum()
    np.testing.assert_allclose(com_proj, com_free, atol=1e-5)


def test_settle_identity_on_satisfying_input():
    """Already-rigid input passes through (theta ~ 0 root selection)."""
    rng = np.random.RandomState(2)
    old = _rand_rigid_molecules(8, rng)
    out = np.asarray(settle(jnp.asarray(old), jnp.asarray(old), P))
    np.testing.assert_allclose(out, old, atol=1e-5)


def test_rattle_velocity_projection():
    rng = np.random.RandomState(3)
    pos = _rand_rigid_molecules(16, rng)
    vel = rng.randn(16, 3, 3)
    vc = np.asarray(rattle_velocities(jnp.asarray(pos), jnp.asarray(vel), P))
    for k, (i, j) in enumerate(PAIRS):
        e = pos[:, i] - pos[:, j]
        e /= np.linalg.norm(e, axis=-1, keepdims=True)
        assert np.abs(np.sum(e * (vc[:, i] - vc[:, j]), -1)).max() < 5e-6
    # Constraint impulses are internal: momentum unchanged.
    m = np.array([P.m_o, P.m_h, P.m_h])[:, None]
    np.testing.assert_allclose((vel * m).sum(1), (vc * m).sum(1), atol=1e-6)


def test_rigid_water_pbc_unwrap():
    """Molecules straddling the periodic boundary are handled."""
    box = 10.0
    cst = RigidWater(2, box, P)
    rng = np.random.RandomState(4)
    mols = _rand_rigid_molecules(2, rng, spread=0.0)
    mols[0] += np.array([9.9, 5.0, 5.0])      # O near +x face
    mols[1] += np.array([5.0, 5.0, 5.0])
    pos = np.mod(mols.reshape(-1, 3), box)    # wrap splits molecule 0
    assert float(cst.residual(jnp.asarray(pos))) < 1e-5
    new = pos + rng.randn(*pos.shape) * 0.05
    out = cst.positions(jnp.asarray(pos), jnp.asarray(new))
    assert float(cst.residual(out)) < 1e-5


def test_constrained_nve_stability_and_energy():
    """Rigid TIP3P NVE at dt=2fs: constraints hold to <1e-6 A over 300
    steps and total (nonbonded + kinetic) energy is conserved."""
    m_mol = 27
    box = 10.0
    params = w.TIP3PParams(cutoff=4.2)
    cst = RigidWater(m_mol, box, P)
    pos = w.water_box(m_mol, box, params, seed=0)
    pos = cst.project_initial(jnp.asarray(pos))
    masses = jnp.asarray(np.tile([P.m_o, P.m_h, P.m_h], m_mol))

    force = jax.jit(lambda p: w.tip3p_forces_rigid(p, box, params))
    dt = 1.0 * units.FS
    init_fn, step_fn = integ.velocity_verlet(force, dt, masses,
                                             constraint=cst)
    vel = integ.maxwell_boltzmann_velocities(jax.random.PRNGKey(0), masses,
                                             300.0)
    state = init_fn(jnp.asarray(pos), vel)

    @jax.jit
    def advance(s):
        return jax.lax.scan(lambda st, _: (step_fn(st), None), s, None,
                            length=300)[0]

    e0 = float(w.tip3p_energy_rigid(state.pos, box, params)
               + integ.kinetic_energy(state.vel, masses))
    state = advance(state)
    assert float(cst.residual(state.pos)) < 5e-6   # fp32 floor at |x|~10 A
    e1 = float(w.tip3p_energy_rigid(state.pos, box, params)
               + integ.kinetic_energy(state.vel, masses))
    assert abs(e1 - e0) / abs(e0) < 0.05


def test_constrained_nhc_temperature_and_ndf():
    """NHC thermostat on rigid water uses ndf = 6 per molecule and holds
    the target temperature."""
    m_mol = 27
    system = get_preset("tip3p", n_atoms=3 * m_mol, box=10.0, cutoff=4.2)
    params = w.TIP3PParams(cutoff=4.2)
    cst = RigidWater(m_mol, 10.0, P)
    md = MDConfig(integrator="nose_hoover", temperature=300.0, dt_fs=2.0,
                  friction_per_ps=25.0, chain_length=10, chain_mts=5,
                  chain_ys=5, rebuild_every=10)
    sim = Simulation(w.tip3p_force_fn(10.0, params, rigid=True), system, md,
                     constraint=cst)
    assert sim.ndf == 6 * m_mol
    pos = cst.project_initial(jnp.asarray(
        w.water_box(m_mol, 10.0, params, seed=1)))
    state = sim.init_state(pos, rng=jax.random.PRNGKey(7))
    result = sim.run(state, 400)
    assert float(cst.residual(result.state.pos)) < 5e-6
    # Mean T over the second half near 300 K (small system: wide tolerance).
    t_mean = float(jnp.mean(result.thermo.temperature[200:]))
    assert 240.0 < t_mean < 360.0


def test_run_recorded_matches_stepwise_run():
    """The on-device frame recorder reproduces the plain runner's states."""
    m_mol = 8
    system = get_preset("tip3p", n_atoms=3 * m_mol, box=8.0, cutoff=4.0)
    params = w.TIP3PParams(cutoff=4.0)
    cst = RigidWater(m_mol, 8.0, P)
    md = MDConfig(integrator="nose_hoover", temperature=300.0, dt_fs=2.0,
                  friction_per_ps=1.0, rebuild_every=5)
    sim = Simulation(w.tip3p_force_fn(8.0, params, rigid=True), system, md,
                     constraint=cst)
    pos = cst.project_initial(jnp.asarray(
        w.water_box(m_mol, 8.0, params, seed=2)))
    state = sim.init_state(pos, rng=jax.random.PRNGKey(3))

    record_force = jax.jit(lambda p: w.tip3p_forces_rigid(p, 8.0, params))
    _, ovf, pos_f, vel_f, force_f, temp = sim.run_recorded(
        state, 3, 10, record_force)
    assert not bool(ovf)
    assert pos_f.shape == (3, 3 * m_mol, 3)

    # Manual reference: frame t recorded before advancing 10 steps.
    from gamd_tpu.core import space
    st = state
    for t in range(3):
        np.testing.assert_allclose(np.asarray(pos_f[t]),
                                   np.asarray(space.wrap(st.pos, 8.0)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(vel_f[t]), np.asarray(st.vel),
                                   atol=1e-5)
        st = sim.run(st, 10).state


def test_generate_rpbe_surrogate_smoke(tmp_path):
    """Tiny surrogate: RealLargeDataset-compatible npz in bohr/Hartree."""
    from gamd_tpu.physics.generate import generate_rpbe_surrogate
    from gamd_tpu.train.data import RealLargeDataset

    out = str(tmp_path / "rpbe.npz")
    generate_rpbe_surrogate(out, n_molecules=8, frames_per_box=2,
                            record_interval=5, box_sizes=[8.0, 8.4],
                            equil_steps=5, minimize_steps=30,
                            log_every_frames=0, frames_per_dispatch=2)
    z = np.load(out)
    assert z["pos"].shape == (4, 24, 3)
    assert z["force"].shape == (4, 24, 3)
    assert z["box"].shape == (4,)
    assert set(np.unique(z["atom_type"])) == {1, 2}
    # box edges stored in bohr
    np.testing.assert_allclose(sorted(set(np.round(z["box"], 3))),
                               sorted({round(8.0 / 0.52917721067, 3),
                                       round(8.4 / 0.52917721067, 3)}),
                               atol=1e-2)
    ds = RealLargeDataset(out, mode="train")
    item = ds[0]
    assert item["pos"].shape == (24, 3)
    assert item["feat"].sum() == 8              # one O per molecule
    ds_t = RealLargeDataset(out, mode="test")
    assert len(ds) + len(ds_t) == 4


def test_generate_rigid_water_smoke(tmp_path):
    """End-to-end tiny rigid generation: files exist, forces are the rigid
    nonbonded forces, molecules satisfy constraints."""
    from gamd_tpu.physics.generate import generate_water_dataset

    out = str(tmp_path / "wdata")
    generate_water_dataset(out, seeds=1, frames_per_seed=3,
                           record_interval=5, n_molecules=8,
                           minimize_steps=50, log_every_frames=0,
                           frames_per_dispatch=2)
    params = w.TIP3PParams()
    d = np.load(f"{out}/data_0_1.npz")
    assert d["pos"].shape == (24, 3)
    cst = RigidWater(8, 20.0, P)
    assert float(cst.residual(jnp.asarray(d["pos"]))) < 1e-5
    # Generation defaults to the reference-protocol Ewald potential —
    # recompute labels with the same potential.
    from gamd_tpu.physics import ewald as _ewald
    ew = _ewald.make_ewald_params(20.0)
    f_expect = np.asarray(-jax.grad(w.tip3p_energy_rigid_ewald)(
        jnp.asarray(d["pos"]), 20.0, ew, params)) \
        / units.KJ_MOL_NM_TO_INTERNAL
    # rtol: the batched (vmapped) recorder reduces pair sums in a
    # different order than this unbatched recompute - f32 ULP-level
    # deviations on O(100 kJ/mol/nm) forces.
    np.testing.assert_allclose(d["forces"], f_expect, rtol=5e-4,
                               atol=5e-2)


@pytest.mark.parametrize("method", ["shake", "settle"])
def test_rigid_nve_energy_conservation(method):
    """NVE + rigid constraints must conserve total energy — the round-2
    SETTLE placement defect pumped energy exponentially (worse at SMALLER
    dt; root cause: absolute-COM f32 rounding amplified ~15x by the
    sin(phi) = z/ra division into null-space rotation noise). The round-3
    relative-coordinate rewrite (settle_correction) holds NVE flat at
    SHAKE's level — both branches are guarded here."""
    import jax
    from gamd_tpu.core.config import MDConfig, get_preset
    from gamd_tpu.md import integrators as integ
    from gamd_tpu.md.simulate import Simulation
    from gamd_tpu.physics import water as w
    from gamd_tpu.physics.minimize import fire_minimize

    n_mol, box = 8, 6.4
    system = get_preset("tip3p", n_atoms=3 * n_mol, box=box, cutoff=3.0,
                        nbr_capacity=24)
    params = w.TIP3PParams(cutoff=box / 2 - 0.01)
    constraint = RigidWater(n_mol, box,
                            tip3p_rigid_params(params.r_oh, params.theta0),
                            method=method)
    pos = w.water_box(n_mol, box, params, seed=1)
    pos, _ = fire_minimize(
        jax.jit(lambda p: w.tip3p_forces(p, box, params)),
        jnp.asarray(pos), n_steps=800, max_step=0.05)
    pos = constraint.project_initial(pos)
    masses = jnp.asarray(system.atom_masses())

    md0 = MDConfig(integrator="langevin", temperature=300.0, dt_fs=1.0,
                   friction_per_ps=5.0, rebuild_every=10)
    sim0 = Simulation(w.tip3p_force_fn(box, params, rigid=True), system,
                      md0, constraint=constraint)
    st0 = sim0.init_state(pos, rng=jax.random.PRNGKey(2))
    r0 = sim0.run(st0, 800)

    md = MDConfig(integrator="nve", dt_fs=2.0, rebuild_every=10)
    sim = Simulation(w.tip3p_force_fn(box, params, rigid=True), system, md,
                     constraint=constraint)
    st = sim.init_state(r0.state.pos, vel=r0.state.vel)

    def etot(s):
        return (float(integ.kinetic_energy(s.vel, masses))
                + float(w.tip3p_energy_rigid(jnp.mod(s.pos, box), box,
                                             params)))

    e0 = etot(st)
    r = sim.run(st, 1000)
    e1 = etot(r.state)
    # |E| scale here is ~180 kJ/mol; drift beyond a few kJ/mol over 2 ps
    # means the projections are doing work.
    assert abs(e1 - e0) < 6.0, (e0, e1)
