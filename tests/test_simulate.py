"""Fused simulation driver tests with the classical LJ potential."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core.config import MDConfig, SystemConfig
from gamd_tpu.md.simulate import Simulation, simulate
from gamd_tpu.md.reporters import StateReporter
from gamd_tpu.physics import lennard_jones as lj
from gamd_tpu.physics.minimize import fire_minimize
from gamd_tpu.physics.rdf import radial_distribution, rdf_l2


def small_lj_system(n=32):
    params = lj.LJParams()
    box, pos = lj.lj_fluid_box(n, 0.5, params)
    # Keep the potential cutoff inside the (small) box's half-width.
    params = lj.LJParams(cutoff=min(params.cutoff, box / 2 - 0.01))
    system = SystemConfig(
        name="test-lj", n_atoms=n, box=box, cutoff=params.cutoff,
        nbr_capacity=n, skin=1.0, species="lj", masses=(lj.ARGON_MASS,),
        temperature=100.0)
    return system, params, pos


def test_forces_dense_vs_neighbor_list_consistency():
    system, params, pos = small_lj_system()
    # Jitter off the perfect lattice: exact-cutoff shells otherwise make pair
    # inclusion float-order dependent (the force is discontinuous at rc for
    # the shifted potential).
    rng = np.random.RandomState(7)
    pos = jnp.asarray(pos + rng.randn(*pos.shape).astype(np.float32) * 0.1)
    from gamd_tpu.neighbors import dense_neighbor_list
    idx, mask, _ = dense_neighbor_list(pos, system.box, params.cutoff + 0.5,
                                       k_max=system.nbr_capacity)
    from gamd_tpu.neighbors.dense import refresh_mask
    live = refresh_mask(pos, system.box, params.cutoff, idx, mask)
    f_nbr = lj.lj_force_fn(system.box, params)(pos, idx, live)
    f_dense = lj.lj_forces_dense(pos, system.box, params)
    np.testing.assert_allclose(np.asarray(f_nbr), np.asarray(f_dense),
                               atol=1e-3)


def test_fire_minimization_reduces_energy():
    system, params, pos = small_lj_system()
    rng = np.random.RandomState(0)
    noisy = jnp.asarray(pos + rng.randn(*pos.shape).astype(np.float32) * 0.3)
    e0 = float(lj.lj_energy_dense(noisy, system.box, params))
    force = lambda p: lj.lj_forces_dense(p, system.box, params)
    x, f = fire_minimize(force, noisy, n_steps=200)
    e1 = float(lj.lj_energy_dense(x, system.box, params))
    assert e1 < e0
    assert float(jnp.max(jnp.abs(f))) < float(jnp.max(jnp.abs(force(noisy))))


def test_nve_energy_conservation():
    """Fused driver, velocity-Verlet: total energy drift small over 400 steps."""
    system, params, pos = small_lj_system()
    md = MDConfig(integrator="nve", dt_fs=2.0, rebuild_every=10,
                  temperature=system.temperature, seed=0)
    force_fn = lj.lj_force_fn(system.box, params)
    sim = Simulation(force_fn, system, md)
    state = sim.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(0))

    def total_energy(st):
        from gamd_tpu.md.integrators import kinetic_energy
        ke = float(kinetic_energy(st.vel, sim.masses))
        pe = float(lj.lj_energy_dense(
            jnp.mod(st.pos, system.box), system.box, params))
        return ke + pe

    e0 = total_energy(state)
    result = sim.run(state, 400)
    assert not bool(result.overflow)
    e1 = total_energy(result.state)
    scale = max(abs(e0), 1.0)
    assert abs(e1 - e0) / scale < 0.02


def test_simulate_convenience_wrapper():
    system, params, pos = small_lj_system(n=32)
    md = MDConfig(integrator="langevin", dt_fs=2.0, temperature=100.0,
                  friction_per_ps=25.0, rebuild_every=10, seed=1, n_steps=50)
    result = simulate(lj.lj_force_fn(system.box, params), system, md,
                      jnp.asarray(pos), rng=jax.random.PRNGKey(1))
    assert result.thermo.temperature.shape == (50,)


def test_langevin_short_run_temperature():
    system, params, pos = small_lj_system(n=64)
    md = MDConfig(integrator="langevin", dt_fs=2.0, temperature=100.0,
                  friction_per_ps=25.0, rebuild_every=10, seed=1)
    sim = Simulation(lj.lj_force_fn(system.box, params), system, md)
    state = sim.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(1))
    result = sim.run(state, 1500)
    temps = np.asarray(result.thermo.temperature)
    t_avg = temps[len(temps) // 2:].mean()
    assert t_avg == pytest.approx(100.0, rel=0.25)
    assert not bool(result.overflow)


def test_nose_hoover_fused_run():
    system, params, pos = small_lj_system(n=32)
    md = MDConfig(integrator="nose_hoover", dt_fs=2.0, temperature=100.0,
                  friction_per_ps=25.0, chain_length=10, rebuild_every=10)
    sim = Simulation(lj.lj_force_fn(system.box, params), system, md)
    state = sim.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(2))
    result = sim.run(state, 500)
    temps = np.asarray(result.thermo.temperature)
    assert np.all(np.isfinite(temps))
    assert temps[-1] > 10.0  # dynamics alive, not frozen/diverged
    assert np.all(np.isfinite(np.asarray(result.state.pos)))


def test_thermo_log_and_reporter(tmp_path):
    system, params, pos = small_lj_system(n=32)
    md = MDConfig(integrator="langevin", rebuild_every=5, temperature=100.0)
    sim = Simulation(lj.lj_force_fn(system.box, params), system, md)
    state = sim.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(3))
    result = sim.run(state, 100)
    assert result.thermo.temperature.shape == (100,)
    path = tmp_path / "log.txt"
    rep = StateReporter(str(path), report_interval=20, dt_fs=2.0)
    n_rows = rep.write(result.thermo)
    assert n_rows == 5
    lines = path.read_text().strip().split("\n")
    assert lines[0].startswith('#"Step"')
    cols = lines[1].split("\t")
    assert int(cols[0]) == 20
    assert float(cols[1]) == pytest.approx(20 * 2.0 * 1e-3)


def test_rdf_ideal_gas_is_flat():
    """Uniform random gas: g(r) ~ 1 away from r=0."""
    rng = np.random.RandomState(0)
    box = 10.0
    frames = rng.uniform(0, box, size=(20, 200, 3)).astype(np.float32)
    r, g = radial_distribution(frames, box, n_bins=25)
    inner = g[(r > 2.0) & (r < 4.5)]
    assert np.abs(inner - 1.0).max() < 0.15


def test_rdf_l2_zero_for_identical():
    g = np.linspace(0, 2, 50)
    assert rdf_l2(g, g) == 0.0


def test_replica_batched_simulation():
    system, params, pos = small_lj_system(n=32)
    md = MDConfig(integrator="langevin", temperature=100.0, rebuild_every=5)
    sim = Simulation(lj.lj_force_fn(system.box, params), system, md)
    states = sim.init_replicas(jnp.asarray(pos), n_replicas=4,
                               rng=jax.random.PRNGKey(7))
    result = sim.run_replicas(states, 30)
    assert result.thermo.temperature.shape == (4, 30)
    assert result.state.pos.shape == (4, 32, 3)
    assert np.all(np.isfinite(np.asarray(result.state.pos)))
    # Replicas diverge (independent noise streams).
    p = np.asarray(result.state.pos)
    assert np.abs(p[0] - p[1]).max() > 1e-4


def test_replica_batched_nose_hoover_matches_single():
    """Unconstrained NHC replicas run the fused batched path (chain state
    [R, M] through the batch-polymorphic _nhc_propagate) — each replica must
    match an independent single-system run of the same initial state."""
    system, params, pos = small_lj_system(n=32)
    md = MDConfig(integrator="nose_hoover", dt_fs=2.0, temperature=100.0,
                  friction_per_ps=25.0, chain_length=10, rebuild_every=5)
    sim = Simulation(lj.lj_force_fn(system.box, params), system, md)
    states = sim.init_replicas(jnp.asarray(pos), n_replicas=3,
                               rng=jax.random.PRNGKey(9))
    result = sim.run_replicas(states, 30)
    assert result.thermo.temperature.shape == (3, 30)
    assert result.state.xi.shape == (3, 10)
    for i in range(3):
        single = jax.tree_util.tree_map(lambda a, i=i: a[i], states)
        res_i = sim.run(single, 30)
        np.testing.assert_allclose(np.asarray(result.state.pos[i]),
                                   np.asarray(res_i.state.pos),
                                   rtol=0, atol=5e-5)
        np.testing.assert_allclose(np.asarray(result.state.vxi[i]),
                                   np.asarray(res_i.state.vxi),
                                   rtol=2e-4, atol=1e-7)


def test_run_segmented_matches_thermo_shape():
    system, params, pos = small_lj_system(n=32)
    md = MDConfig(integrator="langevin", temperature=100.0, rebuild_every=5)
    sim = Simulation(lj.lj_force_fn(system.box, params), system, md)
    st = sim.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(8))
    res = sim.run_segmented(st, 75, segment=30)
    assert res.thermo.temperature.shape == (75,)
    assert res.positions.shape[0] == 15   # 75/5 chunks
    assert np.all(np.isfinite(np.asarray(res.state.pos)))


def test_simulation_cell_list_path():
    """MD driver with the cell-list neighbor method matches dense forces."""
    params = lj.LJParams(cutoff=3.0)
    n = 200
    box = 15.0
    rng = np.random.RandomState(11)
    pos = rng.uniform(0, box, size=(n, 3)).astype(np.float32)
    system = SystemConfig(
        name="cell-lj", n_atoms=n, box=box, cutoff=3.0, nbr_capacity=48,
        skin=0.6, species="lj", masses=(lj.ARGON_MASS,), temperature=100.0)
    md = MDConfig(integrator="nve", dt_fs=1.0, rebuild_every=5)
    sim_cell = Simulation(lj.lj_force_fn(box, params), system, md,
                          nbr_method="cell")
    sim_dense = Simulation(lj.lj_force_fn(box, params), system, md,
                           nbr_method="dense")
    st_c = sim_cell.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(0))
    st_d = sim_dense.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(st_c.force), np.asarray(st_d.force),
                               rtol=1e-4, atol=1e-4)
    rc = sim_cell.run(st_c, 20)
    rd = sim_dense.run(st_d, 20)
    np.testing.assert_allclose(np.asarray(rc.state.pos),
                               np.asarray(rd.state.pos), rtol=1e-4, atol=1e-3)


def test_reporter_with_potential_energy(tmp_path):
    from gamd_tpu.md.simulate import Thermo
    ke = jnp.arange(1.0, 41.0)
    thermo = Thermo(kinetic_energy=ke, temperature=2 * ke)
    pe = -3 * np.arange(1.0, 41.0)
    path = tmp_path / "log_pe.txt"
    rep = StateReporter(str(path), report_interval=10, dt_fs=2.0,
                        potential_energy=True)
    n = rep.write(thermo, potential=pe)
    assert n == 4
    lines = path.read_text().strip().split("\n")
    assert "Potential Energy" in lines[0]
    cols = lines[1].split("\t")
    assert float(cols[2]) == pytest.approx(-30.0)   # PE at step 10
    assert float(cols[3]) == pytest.approx(10.0)    # KE


def test_timer_blocks():
    from gamd_tpu.utils import Timer
    t = Timer()
    x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
    dt = t.stop(x)
    assert dt > 0


def test_generation_rotation_matrix_orthogonal():
    from gamd_tpu.physics.generate import random_rotation_matrix
    r = random_rotation_matrix(np.random.RandomState(3))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_k_model_reduction():
    """k_model slices the distance-sorted list; ample k reproduces the full
    trajectory, starved k raises the overflow flag."""
    system, params, pos = small_lj_system(n=32)
    md = MDConfig(integrator="langevin", temperature=100.0, rebuild_every=5)
    full = Simulation(lj.lj_force_fn(system.box, params), system, md)
    cut = Simulation(lj.lj_force_fn(system.box, params), system, md,
                     k_model=system.nbr_capacity)   # no-op slice
    st_f = full.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(9))
    st_c = cut.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(9))
    r_f = full.run(st_f, 20)
    r_c = cut.run(st_c, 20)
    np.testing.assert_allclose(np.asarray(r_c.state.pos),
                               np.asarray(r_f.state.pos), atol=1e-5)

    # A k_model below the densest row's live count must flag overflow.
    idx, mask, _ = full._build_nbrs(jnp.asarray(pos))
    dens = int(np.asarray(mask).sum(axis=1).max())
    starved = Simulation(lj.lj_force_fn(system.box, params), system, md,
                         k_model=max(dens - 2, 1))
    st_s = starved.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(9))
    r_s = starved.run(st_s, 10)
    assert bool(r_s.overflow)


def test_msd_random_walk_diffusion():
    """MSD of a periodic random walk recovers the known D = var/(6 dt)."""
    from gamd_tpu.physics.rdf import (diffusion_coefficient,
                                      mean_squared_displacement,
                                      unwrap_trajectory)

    rng = np.random.RandomState(0)
    box, n, t = 20.0, 200, 400
    sigma = 0.25                      # A per step per axis
    steps = rng.randn(t - 1, n, 3).astype(np.float32) * sigma
    true_pos = np.cumsum(np.concatenate(
        [rng.uniform(0, box, (1, n, 3)).astype(np.float32), steps]), axis=0)
    wrapped = np.mod(true_pos, box)

    # Unwrapping inverts the wrap exactly (max per-step move << box/2).
    u = np.asarray(unwrap_trajectory(jnp.asarray(wrapped), box))
    np.testing.assert_allclose(u, true_pos, atol=2e-3)

    dt_ps = 0.1
    t_ps, msd = mean_squared_displacement(wrapped, box, dt_ps)
    # MSD(k) = 3 sigma^2 k: check a mid-range lag.
    k = 50
    assert abs(msd[k - 1] / (3 * sigma**2 * k) - 1.0) < 0.05
    d = diffusion_coefficient(t_ps, msd)
    d_true = 3 * sigma**2 / (6 * dt_ps) * 1e-20 / 1e-12
    # The long-lag estimator is noisy (few time origins); the default fit
    # window keeps it under ~10% for this trajectory length.
    assert abs(d / d_true - 1.0) < 0.10


def test_msd_static_system_is_zero():
    from gamd_tpu.physics.rdf import mean_squared_displacement

    pos = np.random.RandomState(1).uniform(0, 10, (5, 50, 3)) * 0 + 3.0
    _, msd = mean_squared_displacement(pos.astype(np.float32), 10.0, 0.1)
    assert np.allclose(msd, 0.0)
