"""NVT/NVE integrators as pure JAX state transforms.

Native replacements for the reference's OpenMM CustomIntegrator "hack"
programs (reference: /root/reference/code/hack_integrator.py). The reference
splits each integrator into two halves purely so an externally-computed GNN
force can be injected between them (force_last / gnn_force per-DoF variables,
hack_integrator.py:145,177,273,421); here the force model is a function the
step closes over, so each step is the textbook single-pass algorithm and the
whole thing fuses into one XLA program under lax.scan.

Units: internal MD units (angstrom, amu, kJ/mol, t0 = 0.1 ps) — see
gamd_tpu.core.units. dt is in internal units (dt_fs * units.FS).

Every factory returns (init_fn, step_fn):
    init_fn(pos, vel[, rng]) -> state        (evaluates the initial force)
    step_fn(state) -> state                  (one full MD step, jit/scan safe)

Holonomic constraints (rigid water): every factory accepts an optional
`constraint` object (gamd_tpu.md.constraints.RigidWater) providing
positions(x_ref, x_new) and velocities(x, v) projections. The constrained
step is the RATTLE-style splitting: drift -> position projection (velocity
absorbs the correction) -> kick -> velocity projection — the native
counterpart of the reference's constraint-applying dummy integrators
(reference: /root/reference/code/water/hack_integrator.py:180-188, and the
OpenMM context constraints they delegate to). BAOAB follows the g-BAOAB
scheme (Leimkuhler & Matthews): projections after every A and O sub-step.
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gamd_tpu.core import units


class NVEState(NamedTuple):
    pos: jnp.ndarray      # [N, 3]
    vel: jnp.ndarray      # [N, 3]
    force: jnp.ndarray    # [N, 3]


class LangevinState(NamedTuple):
    pos: jnp.ndarray
    vel: jnp.ndarray
    force: jnp.ndarray
    rng: jnp.ndarray


class NoseHooverState(NamedTuple):
    pos: jnp.ndarray
    vel: jnp.ndarray
    force: jnp.ndarray
    xi: jnp.ndarray       # [M] thermostat positions
    vxi: jnp.ndarray      # [M] thermostat velocities (1/t0)
    g: jnp.ndarray        # [M] thermostat forces (1/t0^2)


class AndersenState(NamedTuple):
    pos: jnp.ndarray
    vel: jnp.ndarray
    force: jnp.ndarray
    rng: jnp.ndarray


def kinetic_energy(vel, masses):
    """0.5 * sum m v^2 in kJ/mol."""
    return 0.5 * jnp.sum(masses[:, None] * vel * vel)


def temperature(vel, masses, ndf=None):
    """Instantaneous temperature (K): 2 KE / (ndf kB)."""
    if ndf is None:
        ndf = vel.shape[0] * 3
    return 2.0 * kinetic_energy(vel, masses) / (ndf * units.KB)


def maxwell_boltzmann_velocities(rng, masses, temp_k):
    """Draw velocities from the Maxwell-Boltzmann distribution (A/t0)."""
    sigma = jnp.sqrt(units.KB * temp_k / masses)[:, None]
    return sigma * jax.random.normal(rng, (masses.shape[0], 3))


# --------------------------------------------------------------------------
# Velocity Verlet (NVE)
# --------------------------------------------------------------------------

def _drift_project(constraint, x0, v, dt):
    """Drift + SETTLE position projection; the velocity absorbs the
    constraint correction ((x_c - x_free)/dt, the RATTLE convention)."""
    x_free = x0 + dt * v
    if constraint is None:
        return x_free, v
    x_c = constraint.positions(x0, x_free)
    return x_c, v + (x_c - x_free) / dt


def _project_vel(constraint, x, v):
    return v if constraint is None else constraint.velocities(x, v)


def velocity_verlet(force_fn: Callable, dt: float, masses, constraint=None):
    """Plain velocity Verlet; the reference reaches this as the chain_length=0
    degenerate case of its NHC integrator (hack_integrator.py:207)."""
    m = masses[:, None]

    def init_fn(pos, vel):
        return NVEState(pos=pos, vel=_project_vel(constraint, pos, vel),
                        force=force_fn(pos))

    def step_fn(state: NVEState) -> NVEState:
        v = state.vel + 0.5 * dt * state.force / m
        x, v = _drift_project(constraint, state.pos, v, dt)
        f = force_fn(x)
        v = v + 0.5 * dt * f / m
        v = _project_vel(constraint, x, v)
        return NVEState(pos=x, vel=v, force=f)

    return init_fn, step_fn


# --------------------------------------------------------------------------
# BAOAB Langevin
# --------------------------------------------------------------------------

def baoab_langevin(force_fn: Callable, dt: float, masses, temp_k: float,
                   friction: float, constraint=None):
    """BAOAB splitting of Langevin dynamics.

    Fuses the reference's HackLangevinIntegrator (B A O A,
    hack_integrator.py:141-165) with HackHalfVelocityIntegrator (final B,
    :171-178) and the force evaluation the rollout script wedged between them
    (reference: /root/reference/code/LJ/test_script/test_langevin.py:95-113).

    Args:
        friction: collision rate gamma in 1/t0 (friction_per_ps / units.PS...
            i.e. pass gamma_ps * units.PS^-1 == gamma_ps / 10).
    """
    m = masses[:, None]
    a = jnp.exp(-friction * dt)
    b = jnp.sqrt(1.0 - jnp.exp(-2.0 * friction * dt))
    sigma = jnp.sqrt(units.KB * temp_k / masses)[:, None]

    def init_fn(pos, vel, rng):
        return LangevinState(pos=pos, vel=_project_vel(constraint, pos, vel),
                             force=force_fn(pos), rng=rng)

    def step_fn(state: LangevinState, noise=None) -> LangevinState:
        """One BAOAB step. `noise` [N, 3] may be pre-drawn (the fused driver
        generates a whole chunk's noise in one RNG call — per-step threefry
        costs ~20 us on TPU, a block draw amortizes it away)."""
        if noise is None:
            rng, noise_key = jax.random.split(state.rng)
            xi = jax.random.normal(noise_key, state.vel.shape,
                                   state.vel.dtype)
        else:
            rng, xi = state.rng, noise
        v = state.vel + 0.5 * dt * state.force / m              # B
        v = _project_vel(constraint, state.pos, v)
        x, v = _drift_project(constraint, state.pos, v, 0.5 * dt)  # A
        v = a * v + b * sigma * xi                              # O
        v = _project_vel(constraint, x, v)
        x, v = _drift_project(constraint, x, v, 0.5 * dt)       # A
        f = force_fn(x)
        v = v + 0.5 * dt * f / m                                # B
        v = _project_vel(constraint, x, v)
        return LangevinState(pos=x, vel=v, force=f, rng=rng)

    return init_fn, step_fn


# --------------------------------------------------------------------------
# Nose-Hoover chain velocity Verlet
# --------------------------------------------------------------------------

_YS_WEIGHTS = {
    1: [1.0],
    3: [0.8289815435887510, -0.6579630871775020, 0.8289815435887510],
    5: [0.2967324292201065, 0.2967324292201065, -0.1869297168804260,
        0.2967324292201065, 0.2967324292201065],
}


def _nhc_propagate(vel, xi, vxi, g, masses, kt, ndf, q, dt, n_c, ys_weights,
                   ke2=None):
    """Half-step Nose-Hoover chain propagation (MTK, Yoshida-Suzuki + MTS).

    Direct functional transcription of the reference's DSL program
    (reference: /root/reference/code/hack_integrator.py:289-316): same update
    order, same exp(-0.125 wdt vxi) double-half-kick form, same persistent
    chain-force vector G across calls.

    Batch-polymorphic: `vel` may be [N, 3] or [..., N, 3] with xi/vxi/g
    carrying matching leading axes ([..., M]) — each replica then evolves an
    independent thermostat chain, all vectorized through the same scan (no
    vmap lowering; this is what lets `Simulation.run_replicas` fuse NHC
    replicas into one program).

    ke2 may be supplied externally (already [...] shaped 2*KE) — the
    distributed driver psums the per-slab contributions so every shard
    evolves the identical global chain (parallel/halo_gnn.py).
    """
    m_chain = xi.shape[-1]
    if ke2 is None:
        ke2 = jnp.sum(masses[:, None] * vel * vel,
                      axis=(-2, -1))                    # [...] (2 KE)
    g = g.at[..., 0].set((ke2 - ndf * kt) / q[0])

    # One (n_c, ys) sub-step; scanned over the flattened schedule.
    def substep(carry, wdt):
        xi, vxi, g, scale = carry
        vxi = vxi.at[..., m_chain - 1].add(0.25 * wdt * g[..., m_chain - 1])
        for j in range(m_chain - 2, -1, -1):
            aa = jnp.exp(-0.125 * wdt * vxi[..., j + 1])
            vxi = vxi.at[..., j].set(
                aa * (aa * vxi[..., j] + 0.25 * wdt * g[..., j]))
        aa = jnp.exp(-0.5 * wdt * vxi[..., 0])
        scale = scale * aa
        xi = xi + 0.5 * wdt * vxi
        g = g.at[..., 0].set((scale * scale * ke2 - ndf * kt) / q[0])
        for j in range(m_chain - 1):
            aa = jnp.exp(-0.125 * wdt * vxi[..., j + 1])
            vxi = vxi.at[..., j].set(
                aa * (aa * vxi[..., j] + 0.25 * wdt * g[..., j]))
            g = g.at[..., j + 1].set(
                (q[j] * vxi[..., j] * vxi[..., j] - kt) / q[j + 1])
        vxi = vxi.at[..., m_chain - 1].add(0.25 * wdt * g[..., m_chain - 1])
        return (xi, vxi, g, scale), None

    wdts = jnp.asarray(
        np.tile(np.asarray(ys_weights, np.float64), n_c), vel.dtype) * dt / n_c
    (xi, vxi, g, scale), _ = jax.lax.scan(
        substep, (xi, vxi, g, jnp.ones(ke2.shape, vel.dtype)), wdts)
    return vel * scale[..., None, None], xi, vxi, g


def nose_hoover_chain(force_fn: Callable, dt: float, masses, temp_k: float,
                      frequency: float, chain_length: int = 10, n_c: int = 5,
                      n_ys: int = 5, ndf: int = None, constraint=None):
    """Nose-Hoover chain velocity Verlet.

    Fuses HackNoseHooverIntegrator (NHC + first VV half,
    hack_integrator.py:271-277) with HackHalfNoseHooverIntegrator (final kick
    + NHC, :421-423) — the chain state the reference shuttles between the two
    half-integrators via copy_state_from_integrator (:322-331,440-452) simply
    lives in the scan carry.

    Args:
        frequency: thermostat collision frequency in 1/t0
            (freq_per_ps / units.PS... i.e. freq_ps / 10).
        ndf: degrees of freedom (default 3N, unconstrained).
    """
    if n_ys not in _YS_WEIGHTS:
        raise ValueError(f"n_ys must be one of {sorted(_YS_WEIGHTS)}")
    m = masses[:, None]
    n = masses.shape[0]
    if ndf is None:
        ndf = 3 * n - (constraint.n_constraints if constraint else 0)
    kt = units.KB * temp_k
    q_single = kt / frequency**2
    q = jnp.concatenate([jnp.array([ndf * q_single]),
                         jnp.full((chain_length - 1,), q_single)])
    ys = _YS_WEIGHTS[n_ys]

    def init_fn(pos, vel):
        return NoseHooverState(
            pos=pos, vel=_project_vel(constraint, pos, vel),
            force=force_fn(pos),
            xi=jnp.zeros(chain_length),
            vxi=jnp.zeros(chain_length),
            # G initialized to -frequency^2 like the reference
            # (hack_integrator.py:256).
            g=jnp.full((chain_length,), -frequency**2))

    def step_fn(state: NoseHooverState) -> NoseHooverState:
        v, xi, vxi, g = _nhc_propagate(
            state.vel, state.xi, state.vxi, state.g, masses, kt, ndf, q, dt,
            n_c, ys)
        v = v + 0.5 * dt * state.force / m
        x, v = _drift_project(constraint, state.pos, v, dt)
        f = force_fn(x)
        v = v + 0.5 * dt * f / m
        v = _project_vel(constraint, x, v)
        v, xi, vxi, g = _nhc_propagate(v, xi, vxi, g, masses, kt, ndf, q, dt,
                                       n_c, ys)
        return NoseHooverState(pos=x, vel=v, force=f, xi=xi, vxi=vxi, g=g)

    return init_fn, step_fn


def nhc_bath_energies(state: NoseHooverState, temp_k, frequency, ndf):
    """Heat-bath KE/PE, matching HackHalfNoseHooverIntegrator.computeEnergies
    (reference: /root/reference/code/hack_integrator.py:483-493).
    Batch-aware: [..., M] chain state yields [...] energies."""
    kt = units.KB * temp_k
    m_chain = state.xi.shape[-1]
    q_single = kt / frequency**2
    q = jnp.concatenate([jnp.array([ndf * q_single]),
                         jnp.full((m_chain - 1,), q_single)])
    bath_ke = 0.5 * jnp.sum(q * state.vxi**2, axis=-1)
    bath_pe = kt * (ndf * state.xi[..., 0] +
                    jnp.sum(state.xi[..., 1:], axis=-1))
    return bath_ke, bath_pe


# --------------------------------------------------------------------------
# Andersen thermostat velocity Verlet
# --------------------------------------------------------------------------

def andersen(force_fn: Callable, dt: float, masses, temp_k: float,
             collision_rate: float, constraint=None):
    """Velocity Verlet with per-DoF Andersen collisions
    (reference: /root/reference/code/hack_integrator.py:17-87: collision if
    uniform < dt*rate per DoF, velocity redrawn from Maxwell-Boltzmann)."""
    m = masses[:, None]
    p_collision = dt * collision_rate
    sigma = jnp.sqrt(units.KB * temp_k / masses)[:, None]

    def init_fn(pos, vel, rng):
        return AndersenState(pos=pos, vel=_project_vel(constraint, pos, vel),
                             force=force_fn(pos), rng=rng)

    def step_fn(state: AndersenState, noise=None) -> AndersenState:
        """noise, if given, is a pre-drawn (uniform [N,3], normal [N,3])."""
        if noise is None:
            rng, k_u, k_g = jax.random.split(state.rng, 3)
            u = jax.random.uniform(k_u, state.vel.shape)
            xi = jax.random.normal(k_g, state.vel.shape)
        else:
            rng, (u, xi) = state.rng, noise
        collide = u < p_collision
        v = jnp.where(collide, sigma * xi, state.vel)
        v = _project_vel(constraint, state.pos, v)
        v = v + 0.5 * dt * state.force / m
        x, v = _drift_project(constraint, state.pos, v, dt)
        f = force_fn(x)
        v = v + 0.5 * dt * f / m
        v = _project_vel(constraint, x, v)
        return AndersenState(pos=x, vel=v, force=f, rng=rng)

    return init_fn, step_fn
