"""Slab domain decomposition with ppermute halo exchange (stretch rung 2).

parallel/spatial.py scales MD by all-gathering positions every step (O(N)
bytes over ICI per device). This module communicates only BOUNDARY STRIPS:

  * the box is cut into P slabs along x, one per mesh device;
  * between chunks (the same cadence as neighbor-list rebuilds) atoms are
    globally re-sorted into their slabs (fixed per-slab capacity, overflow
    flagged) and each slab precomputes its left/right strip index sets —
    atoms within halo_width = cutoff + skin of a boundary, where the skin
    absorbs intra-chunk drift;
  * inside the chunk, each step ppermutes the two strips to the adjacent
    slabs (O(N * halo/slab_width) bytes — ~10x less than all-gather at the
    100k-atom stretch scale) and computes owned-atom forces against
    owned + halo positions.

Forces here are block-dense against the environment (fine up to ~10^4 atoms
per slab); swapping in the local cell list is the remaining rung. BAOAB
Langevin integration, per-slab noise streams.

Validated against dense single-device forces/trajectories on the virtual
8-device CPU mesh (tests/test_halo.py).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gamd_tpu.core import space, units
from gamd_tpu.physics import lennard_jones as lj


class SlabState(NamedTuple):
    """Per-slab (device-sharded, leading axis = P * capacity) MD state."""

    pos: jnp.ndarray        # [P*C, 3] slab-sorted positions (padded)
    vel: jnp.ndarray        # [P*C, 3]
    valid: jnp.ndarray      # [P*C] bool — real atom vs padding
    left_idx: jnp.ndarray   # [P*Hs] local indices of left-boundary strip
    right_idx: jnp.ndarray  # [P*Hs]
    left_val: jnp.ndarray   # [P*Hs] bool — strip slot holds a NEAR-boundary
    right_val: jnp.ndarray  # [P*Hs]   atom (underfull strips pad with
                            #          arbitrary slab atoms; these masks make
                            #          the filler slots inert by construction)
    left_n: jnp.ndarray     # [P] strip occupancies (per-slab scalars)
    right_n: jnp.ndarray    # [P]
    rng: jnp.ndarray
    overflow: jnp.ndarray   # slab or strip capacity exceeded at sort time
    aux: dict = {}          # per-atom rows sorted alongside pos/vel
                            # (e.g. "aid" global atom ids, "h0" node
                            # embeddings, "mass"); zero-padded — every
                            # consumer must gate on `valid`


def sort_into_slabs(pos, vel, box, n_slabs, capacity, halo_width,
                    strip_capacity, rng, extras=None, group_size: int = 1):
    """Global re-sort (runs replicated; called once per chunk).

    Returns a SlabState with positions grouped by slab of x, padded to
    `capacity` per slab; padding rows carry a far-away sentinel position.
    `extras` is an optional dict of per-atom arrays [N, ...] (species
    embeddings, global atom ids, masses, ...) scattered into the same
    slab-sorted [P*C, ...] layout (zero padding) and carried in `.aux`.

    group_size > 1 (e.g. 3 for rigid water O,H,H triplets) assigns whole
    consecutive groups to the slab of their FIRST atom's x, and the stable
    sort keeps each group contiguous and in order inside its slab — the
    layout per-slab holonomic constraints (SETTLE) require. Atoms of a
    group may then sit up to a bond length outside their slab's nominal
    x-range; size halo_width with that slack.
    """
    n = pos.shape[0]
    slab_w = box / n_slabs
    posw = space.wrap(pos, box)
    if group_size > 1:
        assert n % group_size == 0
        sid_g = jnp.clip((posw[::group_size, 0] / slab_w).astype(jnp.int32),
                         0, n_slabs - 1)
        sid = jnp.repeat(sid_g, group_size)
    else:
        sid = jnp.clip((posw[:, 0] / slab_w).astype(jnp.int32),
                       0, n_slabs - 1)

    order = jnp.argsort(sid, stable=True)   # groups stay contiguous
    sid_sorted = sid[order]
    first = jnp.searchsorted(sid_sorted, sid_sorted, side="left")
    rank = jnp.arange(n) - first
    slab_overflow = jnp.any(rank >= capacity)

    # Scatter into [n_slabs, capacity]; overflowing atoms -> trash slab.
    tgt_slab = jnp.where(rank < capacity, sid_sorted, n_slabs)
    tgt_rank = jnp.where(rank < capacity, rank, 0)
    pos_b = jnp.full((n_slabs + 1, capacity, 3), 2.0 * box, posw.dtype)
    vel_b = jnp.zeros((n_slabs + 1, capacity, 3), vel.dtype)
    val_b = jnp.zeros((n_slabs + 1, capacity), bool)
    pos_b = pos_b.at[tgt_slab, tgt_rank].set(posw[order])
    vel_b = vel_b.at[tgt_slab, tgt_rank].set(vel[order])
    val_b = val_b.at[tgt_slab, tgt_rank].set(True)
    pos_b, vel_b, val_b = pos_b[:-1], vel_b[:-1], val_b[:-1]

    aux = {}
    for name, arr in (extras or {}).items():
        a_b = jnp.zeros((n_slabs + 1, capacity) + arr.shape[1:], arr.dtype)
        a_b = a_b.at[tgt_slab, tgt_rank].set(arr[order])
        aux[name] = a_b[:-1].reshape((-1,) + arr.shape[1:])

    # Strip selection per slab: distance of x to the slab's boundaries.
    slab_lo = (jnp.arange(n_slabs, dtype=posw.dtype) * slab_w)[:, None]
    x = pos_b[..., 0]
    near_left = val_b & (x - slab_lo < halo_width)
    near_right = val_b & (slab_lo + slab_w - x < halo_width)

    def strips(near):
        score = jnp.where(near, 1.0, 0.0)
        v, idx = jax.lax.top_k(score, strip_capacity)       # [P, Hs]
        count = jnp.sum(near, axis=1)
        # top_k sorts descending, so the first `count` slots are the near
        # atoms; later slots are arbitrary fillers and must be masked out.
        slot_ok = jnp.arange(strip_capacity)[None, :] < count[:, None]
        return idx.astype(jnp.int32), slot_ok, count.astype(jnp.int32), \
            jnp.any(count > strip_capacity)

    left_idx, left_val, left_n, ovf_l = strips(near_left)
    right_idx, right_val, right_n, ovf_r = strips(near_right)

    return SlabState(
        pos=pos_b.reshape(-1, 3), vel=vel_b.reshape(-1, 3),
        valid=val_b.reshape(-1),
        left_idx=left_idx.reshape(-1), right_idx=right_idx.reshape(-1),
        left_val=left_val.reshape(-1), right_val=right_val.reshape(-1),
        left_n=left_n, right_n=right_n, rng=rng,
        overflow=slab_overflow | ovf_l | ovf_r, aux=aux)


def gather_from_slabs(state: SlabState, n_atoms):
    """Flatten the slab blocks back to (pos [n?,3], vel, valid) — padding
    rows interleaved; callers filter by `valid`."""
    return state.pos, state.vel, state.valid


def make_halo_lj_step(mesh: Mesh, n_atoms: int, box: float, n_slabs: int,
                      capacity: int, strip_capacity: int,
                      masses_scalar: float, temperature: float,
                      dt_fs: float, friction_per_ps: float,
                      halo_width: float,
                      params: lj.LJParams = lj.LJParams(),
                      axis: str = "dp"):
    """Build (resort_fn, chunk_fn): halo-exchange BAOAB MD over the mesh.

    resort_fn(pos [N,3], vel [N,3], rng) -> SlabState   (replicated compute)
    chunk_fn(state, n_steps)             -> SlabState   (sharded, jitted)
    """
    assert mesh.shape[axis] == n_slabs
    slab_w = box / n_slabs
    # Only adjacent slabs are exchanged: the halo must fit inside one slab,
    # and with 2 slabs the two strips of the single neighbor must not
    # overlap (double counting).
    assert slab_w >= halo_width, (slab_w, halo_width)
    assert n_slabs >= 3 or slab_w >= 2 * halo_width
    dt = dt_fs * units.FS
    gamma = friction_per_ps / units.PS
    a = float(np.exp(-gamma * dt))
    b = float(np.sqrt(1.0 - np.exp(-2.0 * gamma * dt)))
    sigma_v = float(np.sqrt(units.KB * temperature / masses_scalar))
    m = masses_scalar

    def block_force(pos_own, valid_own, env_pos, env_valid):
        """Forces on owned atoms from the owned+halo environment."""
        dr = space.min_image(env_pos[None, :, :] - pos_own[:, None, :], box)
        r2 = jnp.sum(dr * dr, axis=-1)
        ok = (valid_own[:, None] & env_valid[None, :]
              & (r2 < params.cutoff**2) & (r2 > 1e-8))
        r2s = jnp.where(ok, r2, params.sigma**2)
        inv_r6 = (params.sigma**2 / r2s) ** 3
        du_dr2 = 4.0 * params.epsilon * (-6.0 * inv_r6**2
                                         + 3.0 * inv_r6) / r2s
        coef = jnp.where(ok, 2.0 * du_dr2, 0.0)
        return jnp.sum(coef[:, :, None] * dr, axis=1)

    def local_chunk(pos_l, vel_l, valid_l, lidx, ridx, lval, rval, rng,
                    n_steps):
        """One slab's chunk; strips ppermuted every step."""
        me = jax.lax.axis_index(axis)
        left = [(i, (i - 1) % n_slabs) for i in range(n_slabs)]
        right = [(i, (i + 1) % n_slabs) for i in range(n_slabs)]
        rng_local = jax.random.fold_in(rng, me)
        noise = jax.random.normal(rng_local, (n_steps,) + pos_l.shape)

        def exchange(p, v_mask):
            """Send my strips; receive neighbors' strips as halo. Strip
            validity is (valid & near-boundary) so underfull-strip filler
            slots are inert even if a future change moves them closer."""
            send_l = p[lidx]
            send_l_valid = v_mask[lidx] & lval
            send_r = p[ridx]
            send_r_valid = v_mask[ridx] & rval
            # my right strip -> right neighbor's left halo
            halo_from_left = jax.lax.ppermute(send_r, axis, right)
            halo_from_left_ok = jax.lax.ppermute(send_r_valid, axis, right)
            halo_from_right = jax.lax.ppermute(send_l, axis, left)
            halo_from_right_ok = jax.lax.ppermute(send_l_valid, axis, left)
            env = jnp.concatenate([p, halo_from_left, halo_from_right])
            env_ok = jnp.concatenate(
                [v_mask, halo_from_left_ok, halo_from_right_ok])
            return env, env_ok

        env0, env0_ok = exchange(pos_l, valid_l)
        f = block_force(pos_l, valid_l, env0, env0_ok)

        def one_step(carry, xi):
            p, v, f = carry
            v = v + 0.5 * dt * f / m
            p2 = p + 0.5 * dt * v
            v = a * v + b * sigma_v * xi
            p2 = p2 + 0.5 * dt * v
            env, env_ok = exchange(p2, valid_l)
            f2 = block_force(p2, valid_l, env, env_ok)
            v = v + 0.5 * dt * f2 / m
            return (p2, v, f2), None

        (pos_l, vel_l, _), _ = jax.lax.scan(
            one_step, (pos_l, vel_l, f), noise)
        return pos_l, vel_l

    def resort_fn(pos, vel, rng):
        return sort_into_slabs(pos, vel, box, n_slabs, capacity, halo_width,
                               strip_capacity, rng)

    spec3 = P(axis)

    @partial(jax.jit, static_argnames=("n_steps",))
    def chunk_fn(state: SlabState, n_steps: int) -> SlabState:
        rng, k_noise = jax.random.split(state.rng)
        mapped = shard_map(
            partial(local_chunk, n_steps=n_steps), mesh=mesh,
            in_specs=(spec3, spec3, P(axis), P(axis), P(axis), P(axis),
                      P(axis), P()),
            out_specs=(spec3, spec3))
        pos, vel = mapped(state.pos, state.vel, state.valid,
                          state.left_idx, state.right_idx,
                          state.left_val, state.right_val, k_noise)
        return state._replace(pos=pos, vel=vel, rng=rng)

    return resort_fn, chunk_fn


def run_halo_md(mesh, pos, box, n_steps, chunk_steps, n_slabs, capacity,
                strip_capacity, halo_width, masses_scalar, temperature,
                dt_fs, friction_per_ps, rng,
                params: lj.LJParams = lj.LJParams(), axis: str = "dp"):
    """Driver: re-sort into slabs every chunk_steps, halo-exchange between.

    Returns (pos [N?, 3] including padding rows, valid mask, overflow flag).
    """
    resort_fn, chunk_fn = make_halo_lj_step(
        mesh, pos.shape[0], box, n_slabs, capacity, strip_capacity,
        masses_scalar, temperature, dt_fs, friction_per_ps, halo_width,
        params, axis)
    k_vel, rng = jax.random.split(rng)
    vel = float(np.sqrt(units.KB * temperature / masses_scalar)) * \
        jax.random.normal(k_vel, pos.shape)

    overflow = jnp.asarray(False)
    state = resort_fn(jnp.asarray(pos, jnp.float32), vel, rng)
    blk = NamedSharding(mesh, P(axis))
    done = 0
    while done < n_steps:
        overflow = overflow | state.overflow
        state = state._replace(
            pos=jax.device_put(state.pos, blk),
            vel=jax.device_put(state.vel, blk),
            valid=jax.device_put(state.valid, blk),
            left_idx=jax.device_put(state.left_idx, blk),
            right_idx=jax.device_put(state.right_idx, blk),
            left_val=jax.device_put(state.left_val, blk),
            right_val=jax.device_put(state.right_val, blk))
        steps = min(chunk_steps, n_steps - done)
        state = chunk_fn(state, steps)
        done += steps
        if done < n_steps:
            p, v, ok = gather_from_slabs(state, pos.shape[0])
            # Compact valid rows to the front (stable sort on ~valid); with
            # no overflow exactly n_atoms rows are valid.
            order = jnp.argsort(~ok, stable=True)
            state = resort_fn(p[order][:pos.shape[0]],
                              v[order][:pos.shape[0]], state.rng)
    return state.pos, state.valid, overflow | state.overflow
