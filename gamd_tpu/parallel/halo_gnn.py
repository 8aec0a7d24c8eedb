"""Multi-device GNN molecular dynamics: slab decomposition with LAYER-WISE
halo exchange of node features (spatial stretch, rung 3 of SURVEY §2.3).

parallel/halo.py scales CLASSICAL pair forces by exchanging boundary-strip
positions. The GNN force model needs more: a 4-layer message-passing network
has a receptive field of 4 x cutoff, so matching single-device forces with a
one-shot position halo would need a 4x-wide halo and 4x redundant compute.
Instead this module uses the standard distributed-GNN structure:

  * positions: ONE strip exchange per force evaluation (halo width =
    cutoff + skin) builds each slab's environment; a rectangular padded
    neighbor list (owned queries x owned+halo sources) replaces the square
    list;
  * node features: after each conv layer updates the OWNED embeddings, the
    boundary strips' fresh h rows are ppermuted to the adjacent slabs, so
    every layer's gathers read exact current values — per-atom results are
    identical to the single-device model (up to fp reassociation), with
    communication O(strip x D) per layer instead of O(N x D).

The model math comes from ops.pallas_model's composable reference pieces
(encode_edges / node_norm / conv_apply / decode_nodes) over the same packed
MegaParams the megakernel uses — one weight layout, three consumers
(megakernel, XLA reference, distributed force).

The reference has no counterpart (single-GPU rollouts only; its DDP training
is data-parallel — SURVEY §2.3); this is the scaling path the paper's
"linear scaling" claim needs on real multi-chip hardware.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gamd_tpu.core import space, units
from gamd_tpu.neighbors.dense import rect_neighbor_list
from gamd_tpu.ops.pallas_model import (
    MegaParams,
    conv_apply,
    decode_nodes,
    encode_edges,
    node_norm,
)
from gamd_tpu.parallel.halo import SlabState, sort_into_slabs


def make_halo_gnn_force(mesh: Mesh, mp: MegaParams, box: float,
                        n_slabs: int, cutoff: float, skin: float,
                        nbr_capacity: int, h0_row: jnp.ndarray,
                        length_mean, length_std, flip_dir=False,
                        use_ln=True, conv_act="silu", mlp_act="gelu",
                        rbf_gap=0.025, axis: str = "dp"):
    """Build force_fn(state: SlabState) -> ([P*C, 3] forces, overflow).

    h0_row: [D] initial node embedding (LJ broadcast row — the species
    embedding is identical for every atom, so slab permutation is free).
    Jitted per-shard via shard_map; per-atom output matches the
    single-device GAMDNet forward.
    """
    assert mesh.shape[axis] == n_slabs
    halo_width = cutoff + skin
    slab_w = box / n_slabs
    assert slab_w >= halo_width, (slab_w, halo_width)
    assert n_slabs >= 3 or slab_w >= 2 * halo_width
    n_layers = mp.w_src.shape[0]
    d = h0_row.shape[-1]

    def local_force(pos_l, valid_l, lidx, ridx, lval, rval):
        """One slab: env build -> rect list -> encoder -> L conv layers with
        per-layer h strip exchange -> decode. Returns ([C,3], overflow)."""
        left_perm = [(i, (i - 1) % n_slabs) for i in range(n_slabs)]
        right_perm = [(i, (i + 1) % n_slabs) for i in range(n_slabs)]

        def exchange(arr_rows, v_mask):
            """Send my strips of `arr_rows` [C, F]; receive neighbors'."""
            send_l, sl_ok = arr_rows[lidx], v_mask[lidx] & lval
            send_r, sr_ok = arr_rows[ridx], v_mask[ridx] & rval
            from_left = jax.lax.ppermute(send_r, axis, right_perm)
            from_left_ok = jax.lax.ppermute(sr_ok, axis, right_perm)
            from_right = jax.lax.ppermute(send_l, axis, left_perm)
            from_right_ok = jax.lax.ppermute(sl_ok, axis, left_perm)
            return (jnp.concatenate([arr_rows, from_left, from_right]),
                    jnp.concatenate([v_mask, from_left_ok, from_right_ok]))

        c = pos_l.shape[0]
        env_pos, env_ok = exchange(pos_l, valid_l)
        idx, mask, ovf = rect_neighbor_list(
            pos_l, env_pos, env_ok, box, cutoff, nbr_capacity,
            self_idx=jnp.arange(c, dtype=jnp.int32))
        mask = mask & valid_l[:, None]          # padding rows have no edges

        rel = space.min_image(env_pos[idx] - pos_l[:, None, :], box)
        dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
        unit = rel / (dist[..., None] + 1e-8)
        if flip_dir:
            unit = -unit
        std = (dist - length_mean) / length_std
        e = encode_edges(mp, unit, std, None, mlp_act, rbf_gap)

        h_own = jnp.broadcast_to(h0_row, (c, d))
        for layer in range(n_layers):
            hn_own = node_norm(mp, layer, h_own, use_ln)
            hn_env, _ = exchange(hn_own, valid_l)
            h_own = conv_apply(mp, layer, h_own, hn_own, hn_env, e, idx,
                               mask, conv_act)
        forces = decode_nodes(mp, h_own, mlp_act)
        ovf_all = jax.lax.psum(ovf.astype(jnp.int32), axis) > 0
        return jnp.where(valid_l[:, None], forces, 0.0), ovf_all

    spec3 = P(axis)

    @jax.jit
    def force_fn(state: SlabState):
        mapped = shard_map(
            local_force, mesh=mesh,
            in_specs=(spec3, P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(spec3, P()))
        return mapped(state.pos, state.valid, state.left_idx,
                      state.right_idx, state.left_val, state.right_val)

    return force_fn


def make_halo_gnn_md(mesh: Mesh, mp: MegaParams, box: float, n_slabs: int,
                     cutoff: float, skin: float, nbr_capacity: int,
                     h0_row, length_mean, length_std, masses_scalar: float,
                     temperature: float, dt_fs: float, friction_per_ps: float,
                     force_unit: float = 1.0, use_ln=True, axis: str = "dp"):
    """chunk_fn(state, n_steps) for BAOAB GNN-MD over the mesh — the GNN
    analogue of halo.make_halo_lj_step (sort with halo.sort_into_slabs at
    halo_width = cutoff + skin). force_unit converts model output to
    internal kJ/mol/A (fold the scaler into mp via pack_params instead when
    possible)."""
    dt = dt_fs * units.FS
    gamma = friction_per_ps / units.PS
    a = float(np.exp(-gamma * dt))
    b = float(np.sqrt(1.0 - np.exp(-2.0 * gamma * dt)))
    sigma_v = float(np.sqrt(units.KB * temperature / masses_scalar))
    m = masses_scalar
    n_layers = mp.w_src.shape[0]
    d = h0_row.shape[-1]

    def local_chunk(pos_l, vel_l, valid_l, lidx, ridx, lval, rval, rng,
                    n_steps):
        me = jax.lax.axis_index(axis)
        left_perm = [(i, (i - 1) % n_slabs) for i in range(n_slabs)]
        right_perm = [(i, (i + 1) % n_slabs) for i in range(n_slabs)]
        rng_local = jax.random.fold_in(rng, me)
        noise = jax.random.normal(rng_local, (n_steps,) + pos_l.shape)

        def exchange(arr_rows, v_mask):
            send_l, sl_ok = arr_rows[lidx], v_mask[lidx] & lval
            send_r, sr_ok = arr_rows[ridx], v_mask[ridx] & rval
            from_left = jax.lax.ppermute(send_r, axis, right_perm)
            from_left_ok = jax.lax.ppermute(sr_ok, axis, right_perm)
            from_right = jax.lax.ppermute(send_l, axis, left_perm)
            from_right_ok = jax.lax.ppermute(sl_ok, axis, left_perm)
            return (jnp.concatenate([arr_rows, from_left, from_right]),
                    jnp.concatenate([v_mask, from_left_ok, from_right_ok]))

        c = pos_l.shape[0]

        def gnn_force(p):
            posw = space.wrap(p, box)
            env_pos, env_ok = exchange(posw, valid_l)
            idx, mask, _ = rect_neighbor_list(
                posw, env_pos, env_ok, box, cutoff, nbr_capacity,
                self_idx=jnp.arange(c, dtype=jnp.int32))
            mask = mask & valid_l[:, None]
            rel = space.min_image(env_pos[idx] - posw[:, None, :], box)
            dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
            unit = rel / (dist[..., None] + 1e-8)
            std = (dist - length_mean) / length_std
            e = encode_edges(mp, unit, std, None)
            h_own = jnp.broadcast_to(h0_row, (c, d))
            for layer in range(n_layers):
                hn_own = node_norm(mp, layer, h_own, use_ln)
                hn_env, _ = exchange(hn_own, valid_l)
                h_own = conv_apply(mp, layer, h_own, hn_own, hn_env, e, idx,
                                   mask)
            f = decode_nodes(mp, h_own) * force_unit
            return jnp.where(valid_l[:, None], f, 0.0)

        f = gnn_force(pos_l)

        def one_step(carry, xi):
            p, v, f = carry
            v = v + 0.5 * dt * f / m
            p2 = p + 0.5 * dt * v
            v = a * v + b * sigma_v * xi
            p2 = p2 + 0.5 * dt * v
            f2 = gnn_force(p2)
            v = v + 0.5 * dt * f2 / m
            return (p2, v, f2), None

        (pos_l, vel_l, _), _ = jax.lax.scan(one_step, (pos_l, vel_l, f),
                                            noise)
        return pos_l, vel_l

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

    return chunk_fn
