"""Multi-device molecular dynamics via shard_map (scaled-LJ config).

The reference tops out at N = 774 atoms on one GPU (its only parallelism is
DDP gradient averaging, SURVEY.md §2.3). This module scales the *simulation*
itself across a device mesh for large particle counts (the BASELINE.json
stretch config: 100k-atom LJ): atoms are block-sharded over the mesh's 'dp'
axis; each step all-gathers positions over ICI, computes the owned block's
neighbor forces locally, and integrates the owned block. Compute scales as
N^2/P (dense candidate search) or N*K/P; the all-gather is ~N*12 bytes over
ICI per step.

This is classic replicated-coordinate data decomposition — the right first
rung for O(100k) atoms. True spatial decomposition (sharded cell lists +
ppermute halo exchange of boundary particles, avoiding the all-gather) is
the next rung and rides the same shard_map skeleton.

Works with any per-block force closure; the classical LJ block force is
provided for the stretch benchmark. Validated on a virtual 8-device CPU
mesh in tests/test_spatial.py and by __graft_entry__.dryrun_multichip.
"""

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gamd_tpu.core import space, units
from gamd_tpu.physics import lennard_jones as lj


class ShardedMDState(NamedTuple):
    pos: jnp.ndarray    # [N, 3] block-sharded over 'dp'
    vel: jnp.ndarray    # [N, 3] block-sharded
    force: jnp.ndarray  # [N, 3] block-sharded
    rng: jnp.ndarray    # replicated


def block_lj_force(pos_block, pos_all, global_offset, box,
                   params: lj.LJParams = lj.LJParams()):
    """Forces on a block of atoms from all atoms (min-image, cutoff).

    pos_block: [Nb, 3] owned atoms; pos_all: [N, 3] gathered positions;
    global_offset: global index of pos_block[0] (for self-pair exclusion).
    """
    nb = pos_block.shape[0]
    n = pos_all.shape[0]
    dr = space.min_image(pos_all[None, :, :] - pos_block[:, None, :], box)
    r2 = jnp.sum(dr * dr, axis=-1)
    rows = jnp.arange(nb) + global_offset
    self_pair = rows[:, None] == jnp.arange(n)[None, :]
    ok = (r2 < params.cutoff**2) & ~self_pair
    r2s = jnp.where(ok, r2, params.sigma**2)

    # U(r2) = 4 eps (inv_r6^2 - inv_r6); with dr = r_j - r_i,
    # grad_i r2 = -2 dr, so F_i = -dU/dr2 * grad_i r2 = +2 (dU/dr2) dr.
    inv_r2 = params.sigma**2 / r2s
    inv_r6 = inv_r2**3
    du_dr2 = 4.0 * params.epsilon * (-6.0 * inv_r6**2 + 3.0 * inv_r6) / r2s
    coef = jnp.where(ok, 2.0 * du_dr2, 0.0)           # [Nb, N]
    return jnp.sum(coef[:, :, None] * dr, axis=1)


def make_sharded_lj_step(mesh: Mesh, n_atoms: int, box: float,
                         masses_scalar: float, temperature: float,
                         dt_fs: float, friction_per_ps: float,
                         params: lj.LJParams = lj.LJParams(),
                         axis: str = "dp"):
    """Jitted BAOAB Langevin step over the mesh; state block-sharded.

    Returns (init_fn(pos, rng) -> state, step_fn(state, n_steps) -> state).
    n_atoms must be divisible by the mesh axis size.
    """
    n_dev = mesh.shape[axis]
    assert n_atoms % n_dev == 0, (n_atoms, n_dev)
    dt = dt_fs * units.FS
    gamma = friction_per_ps / units.PS
    a = float(jnp.exp(-gamma * dt))
    b = float(jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * dt)))
    sigma_v = float(jnp.sqrt(units.KB * temperature / masses_scalar))
    m = masses_scalar

    def local_steps(pos_blk, vel_blk, force_blk, rng, n_steps):
        """Runs on each device; pos_blk [N/P, 3]."""
        idx = jax.lax.axis_index(axis)
        offset = idx * (n_atoms // n_dev)

        def one_step(carry, noise):
            pos_b, vel_b, force_b = carry
            v = vel_b + 0.5 * dt * force_b / m
            x = pos_b + 0.5 * dt * v
            v = a * v + b * sigma_v * noise
            x = x + 0.5 * dt * v
            # ICI collective: everyone contributes its block.
            pos_all = jax.lax.all_gather(x, axis, tiled=True)      # [N, 3]
            f = block_lj_force(x, pos_all, offset, box, params)
            v = v + 0.5 * dt * f / m
            return (x, v, f), None

        # Per-device independent noise: fold in the axis index.
        rng_local = jax.random.fold_in(rng, idx)
        noise = jax.random.normal(rng_local,
                                  (n_steps,) + pos_blk.shape)
        (pos_b, vel_b, force_b), _ = jax.lax.scan(
            one_step, (pos_blk, vel_blk, force_blk), noise)
        return pos_b, vel_b, force_b

    blk = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def init_fn(pos, rng):
        pos = jax.device_put(jnp.asarray(pos, jnp.float32), blk)
        k_vel, k_state = jax.random.split(rng)
        vel = sigma_v * jax.random.normal(k_vel, pos.shape)
        vel = jax.device_put(vel, blk)

        def init_force(pos_blk):
            idx = jax.lax.axis_index(axis)
            pos_all = jax.lax.all_gather(pos_blk, axis, tiled=True)
            return block_lj_force(pos_blk, pos_all,
                                  idx * (n_atoms // n_dev), box, params)

        force = shard_map(init_force, mesh=mesh, in_specs=P(axis),
                          out_specs=P(axis))(pos)
        return ShardedMDState(pos=pos, vel=vel, force=force,
                              rng=jax.device_put(k_state, rep))

    @partial(jax.jit, static_argnames=("n_steps",))
    def step_fn(state: ShardedMDState, n_steps: int) -> ShardedMDState:
        rng, k_noise = jax.random.split(state.rng)
        mapped = shard_map(
            partial(local_steps, n_steps=n_steps), mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P()),
            out_specs=(P(axis), P(axis), P(axis)))
        pos, vel, force = mapped(state.pos, state.vel, state.force, k_noise)
        return ShardedMDState(pos=pos, vel=vel, force=force, rng=rng)

    return init_fn, step_fn
