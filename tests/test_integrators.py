"""Integrator physics tests: analytic single-step checks, energy conservation,
thermostat temperature control."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core import units
from gamd_tpu.md import integrators as integ


MASSES = jnp.array([1.0, 2.0])


def harmonic_force(k=1.0):
    """F = -k x (3D isotropic oscillator around origin)."""
    return lambda pos: -k * pos


def test_velocity_verlet_single_step_analytic():
    """One VV step against the hand-computed update."""
    dt = 0.1
    init, step = integ.velocity_verlet(harmonic_force(), dt, MASSES)
    pos = jnp.array([[1.0, 0, 0], [0, 2.0, 0]])
    vel = jnp.zeros((2, 3))
    s = init(pos, vel)
    s2 = step(s)
    m = np.asarray(MASSES)[:, None]
    f0 = -np.asarray(pos)
    v_half = 0.5 * dt * f0 / m
    x1 = np.asarray(pos) + dt * v_half
    f1 = -x1
    v1 = v_half + 0.5 * dt * f1 / m
    np.testing.assert_allclose(np.asarray(s2.pos), x1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.vel), v1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.force), f1, rtol=1e-6)


def test_velocity_verlet_energy_conservation():
    """Harmonic oscillator: total energy drift < 1e-4 over 2000 steps."""
    k = 2.0
    dt = 0.01
    masses = jnp.array([1.0])
    init, step = integ.velocity_verlet(harmonic_force(k), dt, masses)
    s = init(jnp.array([[1.0, 0.5, -0.3]]), jnp.array([[0.2, 0.0, 0.1]]))

    def energy(st):
        return (float(integ.kinetic_energy(st.vel, masses))
                + 0.5 * k * float(jnp.sum(st.pos**2)))

    e0 = energy(s)
    s_final = jax.lax.fori_loop(0, 2000, lambda i, st: step(st), s)
    assert energy(s_final) == pytest.approx(e0, rel=1e-4)


def test_velocity_verlet_period():
    """Oscillator period 2*pi*sqrt(m/k) recovered to 1%."""
    k, m_val = 4.0, 1.0
    dt = 0.001
    masses = jnp.array([m_val])
    init, step = integ.velocity_verlet(harmonic_force(k), dt, masses)
    s = init(jnp.array([[1.0, 0, 0]]), jnp.zeros((1, 3)))
    period = 2 * np.pi * np.sqrt(m_val / k)
    n = int(period / dt)
    s = jax.lax.fori_loop(0, n, lambda i, st: step(st), s)
    assert float(s.pos[0, 0]) == pytest.approx(1.0, abs=0.01)


def _free_particle_thermo_run(factory_kwargs, integrator, n_steps=4000):
    """Weakly-coupled oscillators under a thermostat -> average T near target."""
    n = 64
    k = 0.5
    temp_target = 300.0
    masses = jnp.full((n,), 12.0)
    dt = 2.0 * units.FS
    rng = jax.random.PRNGKey(0)
    pos = jax.random.normal(rng, (n, 3))
    vel = integ.maxwell_boltzmann_velocities(
        jax.random.PRNGKey(1), masses, temp_target)

    if integrator == "langevin":
        init, step = integ.baoab_langevin(
            harmonic_force(k), dt, masses, temp_target, **factory_kwargs)
        s = init(pos, vel, jax.random.PRNGKey(2))
    elif integrator == "nose_hoover":
        init, step = integ.nose_hoover_chain(
            harmonic_force(k), dt, masses, temp_target, **factory_kwargs)
        s = init(pos, vel)
    else:
        init, step = integ.andersen(
            harmonic_force(k), dt, masses, temp_target, **factory_kwargs)
        s = init(pos, vel, jax.random.PRNGKey(2))

    def body(s, _):
        s = step(s)
        return s, integ.temperature(s.vel, masses)

    s, temps = jax.lax.scan(body, s, None, length=n_steps)
    # Discard the first half as equilibration.
    return float(jnp.mean(temps[n_steps // 2:]))


def test_baoab_langevin_temperature():
    t_avg = _free_particle_thermo_run(
        {"friction": 25.0 / units.PS}, "langevin")
    assert t_avg == pytest.approx(300.0, rel=0.1)


def test_nose_hoover_temperature():
    t_avg = _free_particle_thermo_run(
        {"frequency": 25.0 / units.PS, "chain_length": 10, "n_c": 5,
         "n_ys": 5}, "nose_hoover")
    assert t_avg == pytest.approx(300.0, rel=0.1)


def test_andersen_temperature():
    t_avg = _free_particle_thermo_run(
        {"collision_rate": 25.0 / units.PS}, "andersen")
    assert t_avg == pytest.approx(300.0, rel=0.1)


def test_nhc_deterministic_and_chain_state_evolves():
    masses = jnp.full((8,), 1.0)
    init, step = integ.nose_hoover_chain(
        harmonic_force(), 0.01, masses, 100.0, frequency=2.0, chain_length=4)
    rng = jax.random.PRNGKey(3)
    pos = jax.random.normal(rng, (8, 3))
    vel = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
    s1 = step(init(pos, vel))
    s2 = step(init(pos, vel))
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))
    assert not np.allclose(np.asarray(s1.vxi), 0.0)
    assert np.asarray(s1.xi).shape == (4,)


def test_nhc_bath_energies_finite():
    masses = jnp.full((8,), 1.0)
    init, step = integ.nose_hoover_chain(
        harmonic_force(), 0.01, masses, 100.0, frequency=2.0, chain_length=4)
    s = init(jax.random.normal(jax.random.PRNGKey(5), (8, 3)),
             jax.random.normal(jax.random.PRNGKey(6), (8, 3)))
    for _ in range(10):
        s = step(s)
    ke, pe = integ.nhc_bath_energies(s, 100.0, 2.0, 24)
    assert np.isfinite(float(ke)) and np.isfinite(float(pe))
    assert float(ke) >= 0.0


def test_maxwell_boltzmann_temperature():
    masses = jnp.full((5000,), 39.948)
    vel = integ.maxwell_boltzmann_velocities(
        jax.random.PRNGKey(0), masses, 100.0)
    t = float(integ.temperature(vel, masses))
    assert t == pytest.approx(100.0, rel=0.05)


def test_kinetic_energy_units():
    """KE of one argon atom at 100 K should average 1.5 kB T."""
    masses = jnp.full((20000,), 39.948)
    vel = integ.maxwell_boltzmann_velocities(
        jax.random.PRNGKey(1), masses, 100.0)
    ke_per_atom = float(integ.kinetic_energy(vel, masses)) / 20000
    assert ke_per_atom == pytest.approx(1.5 * units.KB * 100.0, rel=0.03)
