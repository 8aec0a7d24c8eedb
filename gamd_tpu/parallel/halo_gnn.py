"""Multi-device GNN molecular dynamics: slab decomposition with LAYER-WISE
halo exchange of node features (spatial stretch, rung 3 of SURVEY §2.3).

parallel/halo.py scales CLASSICAL pair forces by exchanging boundary-strip
positions. The GNN force model needs more: a 4-layer message-passing network
has a receptive field of 4 x cutoff. This module implements BOTH standard
distributed-GNN layouts and lets the caller pick by regime:

  * LAYER-WISE (make_halo_gnn_force / default MD): narrow halo
    (cutoff + skin), fresh boundary features ppermuted after every conv
    layer — minimal redundant compute, 1 + n_layers exchanges per force
    evaluation. Right when slabs are narrow (small boxes).
  * WIDE-HALO (make_wide_halo_gnn_force / wide=True MD): halo =
    n_layers * cutoff + skin, ONE position exchange, whole forward local
    (ghost embeddings near the outer edge go progressively stale but stay
    out of owned rows) — redundant conv compute on the ghost strips,
    a single latency hop per force evaluation. Right when slabs are wide
    (large N per chip, ICI-latency-bound), and the layout the banded
    gather kernel composes with (banded=True: slab decomposition across
    chips x HBM->VMEM band gathers within each chip).

The layer-wise structure:

  * positions: ONE strip exchange per force evaluation (halo width =
    cutoff + skin) builds each slab's environment; a rectangular padded
    neighbor list (owned queries x owned+halo sources) replaces the square
    list;
  * node features: after each conv layer updates the OWNED embeddings, the
    boundary strips' fresh h rows are ppermuted to the adjacent slabs, so
    every layer's gathers read exact current values — per-atom results are
    identical to the single-device model (up to fp reassociation), with
    communication O(strip x D) per layer instead of O(N x D).

Species support (round 3): water systems carry per-atom state through the
slab sort via SlabState.aux — "h0" (encoded species embeddings, exchanged
exactly like conv features), "aid" (global atom ids, exchanged so the
O-H bond channel can be evaluated against halo sources with the analytic
i%3 topology test), "mass" (per-atom masses for the integrator). Atom
migration across slab boundaries is handled by run_halo_gnn_md: between
chunks the state is gathered, compacted, and re-sorted (the `resort_fn`
the classical halo driver already had — VERDICT round-2 weak #5).

The model math comes from ops.pallas_model's composable reference pieces
(encode_edges / node_norm / conv_apply / decode_nodes) over the same packed
MegaParams the megakernel uses — one weight layout, three consumers
(megakernel, XLA reference, distributed force).

The reference has no counterpart (single-GPU rollouts only; its DDP training
is data-parallel — SURVEY §2.3); this is the scaling path the paper's
"linear scaling" claim needs on real multi-chip hardware.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gamd_tpu.core import space, units
from gamd_tpu.neighbors.dense import rect_neighbor_list
from gamd_tpu.neighbors.topology import water_bond_mask
from gamd_tpu.ops.pallas_model import (
    MegaParams,
    conv_apply,
    decode_nodes,
    encode_edges,
    node_norm,
)
from gamd_tpu.parallel.halo import SlabState, sort_into_slabs


def _make_exchange(axis, n_slabs, lidx, ridx, lval, rval):
    """Strip ppermute closure: rows [C, ...] -> (env [C+2*Hs, ...], ok)."""
    left_perm = [(i, (i - 1) % n_slabs) for i in range(n_slabs)]
    right_perm = [(i, (i + 1) % n_slabs) for i in range(n_slabs)]

    def exchange(arr_rows, v_mask):
        send_l, sl_ok = arr_rows[lidx], v_mask[lidx] & lval
        send_r, sr_ok = arr_rows[ridx], v_mask[ridx] & rval
        from_left = jax.lax.ppermute(send_r, axis, right_perm)
        from_left_ok = jax.lax.ppermute(sr_ok, axis, right_perm)
        from_right = jax.lax.ppermute(send_l, axis, left_perm)
        from_right_ok = jax.lax.ppermute(sl_ok, axis, left_perm)
        return (jnp.concatenate([arr_rows, from_left, from_right]),
                jnp.concatenate([v_mask, from_left_ok, from_right_ok]))

    return exchange


def _slab_forward(mp, box, cutoff, nbr_capacity, length_mean, length_std,
                  exchange, pos_l, valid_l, h0_own, aid_l, flip_dir,
                  use_ln, conv_act, mlp_act, rbf_gap, nbr=None,
                  bond=None):
    """One slab's force evaluation: env build -> rect list -> encoder ->
    L conv layers with per-layer h strip exchange -> decode.

    h0_own: [C, D] per-slab initial node features (broadcast row for LJ,
    aux-sorted species encodings for water). aid_l: [C] global atom ids or
    None — when given, the water O-H bond channel is appended per edge
    (reference: /root/reference/code/nn_module.py:510-511), with halo
    sources resolved through the exchanged id rows.
    Returns ([C, 3] forces, overflow flag local to this call).

    nbr=(idx, build_mask): reuse a list built once per chunk at
    cutoff+skin (env row identity is fixed within a chunk — the strips
    are); the true-cutoff mask is refreshed from current distances, so
    results are exact while drift stays inside the skin. O(C*K) per step
    instead of the O(C*E) rect rebuild.
    """
    n_layers = mp.w_src.shape[0]
    c = pos_l.shape[0]
    env_pos, env_ok = exchange(pos_l, valid_l)
    if nbr is None:
        idx, mask, ovf = rect_neighbor_list(
            pos_l, env_pos, env_ok, box, cutoff, nbr_capacity,
            self_idx=jnp.arange(c, dtype=jnp.int32))
        mask = mask & valid_l[:, None]      # padding rows have no edges
    else:
        idx, mask = nbr
        ovf = jnp.asarray(False)

    rel = space.min_image(env_pos[idx] - pos_l[:, None, :], box)
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
    if nbr is not None:
        mask = mask & (dist * dist < cutoff * cutoff)
    unit = rel / (dist[..., None] + 1e-8)
    if flip_dir:
        unit = -unit
    std = (dist - length_mean) / length_std
    if bond is None and aid_l is not None:
        # Chunk-invariant when the list is reused — callers hoist it.
        aid_env, _ = exchange(aid_l, valid_l)
        bond = water_bond_mask(aid_l[:, None], aid_env[idx])
    e = encode_edges(mp, unit, std, bond, mlp_act, rbf_gap)

    h_own = h0_own
    for layer in range(n_layers):
        hn_own = node_norm(mp, layer, h_own, use_ln)
        hn_env, _ = exchange(hn_own, valid_l)
        h_own = conv_apply(mp, layer, h_own, hn_own, hn_env, e, idx,
                           mask, conv_act)
    forces = decode_nodes(mp, h_own, mlp_act)
    return jnp.where(valid_l[:, None], forces, 0.0), ovf


def _wide_slab_forward_banded(mp, box, cutoff, nbr_capacity, length_mean,
                              length_std, exchange, pos_l, valid_l, h0_env,
                              aid_env, flip_dir, use_ln, mlp_act, rbf_gap,
                              x_center, band, banded_tile, interpret,
                              nbr=None):
    """Wide-halo slab forward through the BANDED whole-model kernel
    (ops.banded): env rows are unwrapped along x around the slab center,
    x-sorted so each tile's neighbors form a tight index band, and the
    full forward runs per slab with HBM->VMEM band DMAs instead of
    O(E^2) one-hot or random row gathers. This composes the two TPU-first
    scaling mechanisms: slab decomposition across chips x banded gathers
    within a chip.

    h0_env/aid_env are PRE-EXCHANGED env rows ([E, D] / [E] or None) —
    they are chunk-invariant, so MD callers hoist their exchange out of
    the step loop (only positions ride a ppermute per evaluation)."""
    from gamd_tpu.ops.banded import banded_forward

    c = pos_l.shape[0]
    env_pos, env_ok = exchange(pos_l, valid_l)
    e_rows = env_pos.shape[0]
    if nbr is None:
        idx, mask, ovf = rect_neighbor_list(
            env_pos, env_pos, env_ok, box, cutoff, nbr_capacity,
            self_idx=jnp.arange(e_rows, dtype=jnp.int32))
        mask = mask & env_ok[:, None]
    else:
        # Reused chunk list (built at cutoff+skin); banded_forward applies
        # the true-cutoff mask from current distances itself.
        idx, mask = nbr
        ovf = jnp.asarray(False)

    # Unwrap x around the slab center so ghosts across the periodic seam
    # sort adjacent to the boundary they touch (tight bands); invalid rows
    # sort to the end.
    dx = jnp.mod(env_pos[:, 0] - x_center + 0.5 * box, box) - 0.5 * box
    perm = jnp.argsort(jnp.where(env_ok, dx, 1e9))
    inv = jnp.argsort(perm)
    pos_s = env_pos[perm]
    idx_s = inv[idx[perm]]
    mask_s = mask[perm]
    h0_s = h0_env[perm]
    bond = None
    if aid_env is not None:
        aid_s = aid_env[perm]
        bond = water_bond_mask(aid_s[:, None], aid_s[idx_s])

    f_s, ovf_band = banded_forward(
        pos_s, idx_s, mask_s, h0_s, mp, box, cutoff, length_mean,
        length_std, band, banded_tile, bond=bond, rbf_gap=rbf_gap,
        flip_dir=flip_dir, use_ln=use_ln, mlp_act=mlp_act,
        interpret=interpret)
    forces = f_s[inv][:c]
    return (jnp.where(valid_l[:, None], forces, 0.0),
            ovf | ovf_band)


def wide_band_default(env_rows: int, cutoff: float, slab_w: float,
                      halo_width: float, tile_n: int = 64) -> int:
    """Band height for the banded wide-halo path: the neighbor arc of a
    tile spans ~2*cutoff of the env's x-extent (slab + both halos), with
    30% density margin; 128-aligned, capped at the env row count."""
    frac = min(2.0 * cutoff / (slab_w + 2.0 * halo_width), 1.0)
    band = -(-max(int(env_rows * frac * 1.3) + tile_n + 16, 256) // 128) \
        * 128
    return min(band, -(-env_rows // 16) * 16)


def _wide_slab_forward(mp, box, cutoff, nbr_capacity, length_mean,
                       length_std, exchange, pos_l, valid_l, h0_env,
                       aid_env, flip_dir, use_ln, conv_act, mlp_act,
                       rbf_gap, nbr=None):
    """Wide-halo slab forward: ONE position exchange, whole forward local.

    The exchange strips must cover n_layers * cutoff (caller-asserted), so
    every owned atom's full L-hop receptive field is resident. All env rows
    (owned + ghosts) run the encoder and every conv layer locally — ghosts
    near the outer halo edge compute progressively wrong embeddings, but
    wrongness at depth l only reaches (L - l) * cutoff inward, which the
    halo width keeps away from owned rows. Owned forces are exact (up to
    fp reassociation) with ZERO per-layer communication: one ppermute pair
    per force evaluation instead of 1 + n_layers. The trade is redundant
    conv compute on the two ghost strips — the right side of the
    compute-vs-ICI-latency trade when slabs are wide (large N per chip).
    h0_env/aid_env are PRE-EXCHANGED env rows (chunk-invariant — MD
    callers hoist their exchange out of the step loop).
    """
    n_layers = mp.w_src.shape[0]
    c = pos_l.shape[0]
    env_pos, env_ok = exchange(pos_l, valid_l)
    e_rows = env_pos.shape[0]
    if nbr is None:
        # Square-over-env neighbor list: every env row is a query too.
        idx, mask, ovf = rect_neighbor_list(
            env_pos, env_pos, env_ok, box, cutoff, nbr_capacity,
            self_idx=jnp.arange(e_rows, dtype=jnp.int32))
        mask = mask & env_ok[:, None]
    else:
        idx, mask = nbr
        ovf = jnp.asarray(False)

    rel = space.min_image(env_pos[idx] - env_pos[:, None, :], box)
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
    if nbr is not None:
        mask = mask & (dist * dist < cutoff * cutoff)
    unit = rel / (dist[..., None] + 1e-8)
    if flip_dir:
        unit = -unit
    std = (dist - length_mean) / length_std
    bond = None
    if aid_env is not None:
        bond = water_bond_mask(aid_env[:, None], aid_env[idx])
    e = encode_edges(mp, unit, std, bond, mlp_act, rbf_gap)

    h_env = h0_env
    for layer in range(n_layers):
        hn = node_norm(mp, layer, h_env, use_ln)
        h_env = conv_apply(mp, layer, h_env, hn, hn, e, idx, mask, conv_act)
    forces = decode_nodes(mp, h_env[:c], mlp_act)
    return jnp.where(valid_l[:, None], forces, 0.0), ovf


def make_wide_halo_gnn_force(mesh: Mesh, mp: MegaParams, box: float,
                             n_slabs: int, cutoff: float, skin: float,
                             nbr_capacity: int, h0_row, length_mean,
                             length_std, flip_dir=False, use_ln=True,
                             conv_act="silu", mlp_act="gelu", rbf_gap=0.025,
                             axis: str = "dp", use_bond: bool = False,
                             per_atom_h0: bool = False,
                             banded: bool = False, band: int = None,
                             banded_tile: int = 64,
                             interpret: bool = False):
    """Wide-halo variant of make_halo_gnn_force: sort the state with
    halo_width = n_layers * cutoff + skin (wide_halo_width helper), then
    each force call does ONE strip exchange and computes the whole model
    locally — see _wide_slab_forward for the latency/compute trade.
    Requires slab width >= the wide halo, i.e. large boxes (the scaling
    regime this path exists for).

    banded=True routes the local forward through the banded gather kernel
    (ops.banded; bond via aid when use_bond): slab decomposition across
    chips x banded HBM->VMEM gathers within each chip. band defaults to
    wide_band_default; interpret runs the kernel in interpret mode (CPU
    tests)."""
    assert mesh.shape[axis] == n_slabs
    n_layers = mp.w_src.shape[0]
    halo_width = n_layers * cutoff + skin
    slab_w = box / n_slabs
    assert slab_w >= halo_width, (
        f"wide halo needs slab width {slab_w:.2f} >= n_layers*cutoff+skin "
        f"= {halo_width:.2f}; use make_halo_gnn_force (layer-wise) for "
        f"small boxes")
    # 2-slab meshes deliver both strips to the SAME peer: any atom within
    # halo of both boundaries would appear twice in its env (duplicate
    # edges, double-counted messages).
    assert n_slabs >= 3 or slab_w >= 2 * halo_width
    assert not banded or conv_act == "silu", \
        "the banded kernel hard-codes the silu conv activation"
    d = mp.w_src.shape[-2]

    def local_force(pos_l, valid_l, lidx, ridx, lval, rval, *extra):
        exchange = _make_exchange(axis, n_slabs, lidx, ridx, lval, rval)
        i = 0
        if per_atom_h0:
            h0_own = extra[i]; i += 1
        else:
            h0_own = jnp.broadcast_to(h0_row, (pos_l.shape[0], d))
        aid_l = extra[i] if use_bond else None
        h0_env, _ = exchange(h0_own, valid_l)
        aid_env = exchange(aid_l, valid_l)[0] if use_bond else None
        if banded:
            c = pos_l.shape[0]
            e_rows = c + 2 * lidx.shape[0]
            b = band or wide_band_default(e_rows, cutoff, slab_w,
                                          halo_width, banded_tile)
            me = jax.lax.axis_index(axis)
            x_center = (me.astype(jnp.float32) + 0.5) * slab_w
            forces, ovf = _wide_slab_forward_banded(
                mp, box, cutoff, nbr_capacity, length_mean, length_std,
                exchange, pos_l, valid_l, h0_env, aid_env, flip_dir,
                use_ln, mlp_act, rbf_gap, x_center, b, banded_tile,
                interpret)
        else:
            forces, ovf = _wide_slab_forward(
                mp, box, cutoff, nbr_capacity, length_mean, length_std,
                exchange, pos_l, valid_l, h0_env, aid_env, flip_dir,
                use_ln, conv_act, mlp_act, rbf_gap)
        ovf_all = jax.lax.psum(ovf.astype(jnp.int32), axis) > 0
        return forces, ovf_all

    spec3 = P(axis)
    n_extra = int(per_atom_h0) + int(use_bond)
    in_specs = (spec3,) * (6 + n_extra)

    @jax.jit
    def force_fn(state: SlabState):
        mapped = shard_map(
            local_force, mesh=mesh, in_specs=in_specs,
            out_specs=(spec3, P()),
            # VMA checking stays on except where a per-shard pallas_call
            # (no vma annotation on its out_shape) forces it off.
            check_vma=not banded)
        extra = ()
        if per_atom_h0:
            extra += (state.aux["h0"],)
        if use_bond:
            extra += (state.aux["aid"],)
        return mapped(state.pos, state.valid, state.left_idx,
                      state.right_idx, state.left_val, state.right_val,
                      *extra)

    return force_fn


def wide_halo_width(mp: MegaParams, cutoff: float, skin: float) -> float:
    """Sort-time halo width for the wide-halo path (pass to
    sort_into_slabs): the L-layer receptive field plus skin."""
    return mp.w_src.shape[0] * cutoff + skin


def make_halo_gnn_force(mesh: Mesh, mp: MegaParams, box: float,
                        n_slabs: int, cutoff: float, skin: float,
                        nbr_capacity: int, h0_row, length_mean, length_std,
                        flip_dir=False, use_ln=True, conv_act="silu",
                        mlp_act="gelu", rbf_gap=0.025, axis: str = "dp",
                        use_bond: bool = False, per_atom_h0: bool = False):
    """Build force_fn(state: SlabState) -> ([P*C, 3] forces, overflow).

    h0_row: [D] initial node embedding broadcast to every atom (the LJ
    species embedding) — ignored when per_atom_h0 is set, in which case
    state.aux["h0"] [P*C, D] supplies slab-sorted per-atom embeddings
    (water one-hot @ encoder). use_bond additionally requires
    state.aux["aid"] [P*C] int32 global atom ids.
    Jitted per-shard via shard_map; per-atom output matches the
    single-device GAMDNet forward.
    """
    assert mesh.shape[axis] == n_slabs
    halo_width = cutoff + skin
    slab_w = box / n_slabs
    assert slab_w >= halo_width, (slab_w, halo_width)
    assert n_slabs >= 3 or slab_w >= 2 * halo_width
    d = mp.w_src.shape[-2]

    def local_force(pos_l, valid_l, lidx, ridx, lval, rval, *extra):
        exchange = _make_exchange(axis, n_slabs, lidx, ridx, lval, rval)
        i = 0
        if per_atom_h0:
            h0_own = extra[i]; i += 1
        else:
            h0_own = jnp.broadcast_to(h0_row, (pos_l.shape[0], d))
        aid_l = extra[i] if use_bond else None
        forces, ovf = _slab_forward(
            mp, box, cutoff, nbr_capacity, length_mean, length_std,
            exchange, pos_l, valid_l, h0_own, aid_l, flip_dir, use_ln,
            conv_act, mlp_act, rbf_gap)
        ovf_all = jax.lax.psum(ovf.astype(jnp.int32), axis) > 0
        return forces, ovf_all

    spec3 = P(axis)
    n_extra = int(per_atom_h0) + int(use_bond)
    in_specs = (spec3,) * (6 + n_extra)

    @jax.jit
    def force_fn(state: SlabState):
        mapped = shard_map(
            local_force, mesh=mesh, in_specs=in_specs,
            out_specs=(spec3, P()))
        extra = ()
        if per_atom_h0:
            extra += (state.aux["h0"],)
        if use_bond:
            extra += (state.aux["aid"],)
        return mapped(state.pos, state.valid, state.left_idx,
                      state.right_idx, state.left_val, state.right_val,
                      *extra)

    return force_fn


def make_halo_gnn_md(mesh: Mesh, mp: MegaParams, box: float, n_slabs: int,
                     cutoff: float, skin: float, nbr_capacity: int,
                     h0_row, length_mean, length_std, masses_scalar: float,
                     temperature: float, dt_fs: float, friction_per_ps: float,
                     force_unit: float = 1.0, use_ln=True, axis: str = "dp",
                     use_bond: bool = False, per_atom_h0: bool = False,
                     per_atom_mass: bool = False, flip_dir=False,
                     conv_act="silu", mlp_act="gelu", rbf_gap=0.025,
                     wide: bool = False, banded: bool = False,
                     band: int = None, banded_tile: int = 64,
                     interpret: bool = False,
                     integrator: str = "langevin", ndf: int = None,
                     chain_length: int = 10, chain_mts: int = 5,
                     chain_ys: int = 5, constraint=None,
                     reuse_nbrs: bool = True):
    """chunk_fn(state, n_steps) for BAOAB GNN-MD over the mesh — the GNN
    analogue of halo.make_halo_lj_step (sort with halo.sort_into_slabs at
    halo_width = cutoff + skin, or wide_halo_width(...) when wide=True).
    force_unit converts model output to internal kJ/mol/A (fold the scaler
    into mp via pack_params instead when possible). per_atom_mass reads
    state.aux["mass"] [P*C] (water O/H); masses_scalar is then unused.
    wide=True uses the one-exchange wide-halo forward (_wide_slab_forward)
    — caller must sort with the wide halo width. banded=True (requires
    wide) runs it through the banded gather kernel (see
    make_wide_halo_gnn_force). Force-path overflow (rect-list or band)
    NaN-poisons the forces — the Simulation-level convention; drivers and
    tests assert finiteness and fail loudly instead of continuing with
    silently dropped/mis-gathered edges.

    integrator="nose_hoover": ONE GLOBAL chain thermostats the whole
    system — per-slab kinetic energies are psum'd so every shard evolves
    the identical [M] chain redundantly (cheap scalar math, zero extra
    comm beyond the one psum/step). Deterministic, so distributed
    trajectories are directly comparable to single-device NHC. The chain
    state rides the chunk boundary: chunk_fn(state, n_steps, chain) ->
    (state, chain); chunk_fn.init_chain() builds the t=0 chain and
    chunk_fn.needs_chain = True tells run_halo_gnn_md to thread it.
    ndf (global degrees of freedom, typically 3*N) is required.

    constraint (langevin only): a per-slab md.constraints.RigidWater built
    for capacity//3 molecules — REQUIRES the state to have been sorted
    with sort_into_slabs(group_size=3) so every slab owns whole O,H,H
    triplets in order, and halo_width sized with ~1 A of bond slack.
    Projections follow the single-device g-BAOAB splitting exactly
    (integrators.baoab_langevin); padding "molecules" (degenerate
    sentinel geometry) are masked back to their unconstrained values.

    reuse_nbrs (default True): the neighbor list is built ONCE per chunk
    at cutoff+skin and each step refreshes the true-cutoff mask from
    current distances — O(C*K)/step instead of the O(C*E) rect rebuild,
    exact while intra-chunk drift stays inside the skin (the same
    contract as the single-device Simulation driver). Requires the sort
    halo_width >= cutoff + skin, which all callers already use, and
    nbr_capacity sized for cutoff+skin neighborhoods (larger than the
    per-step-rebuild requirement of plain cutoff; an undersized capacity
    overflows at chunk start and NaN-poisons the whole chunk loudly)."""
    assert not banded or wide, "banded requires wide=True"
    assert not banded or conv_act == "silu", \
        "the banded kernel hard-codes the silu conv activation"
    assert integrator in ("langevin", "nose_hoover")
    if integrator == "nose_hoover":
        assert ndf is not None, "distributed NHC needs global ndf (3*N)"
        assert constraint is None, \
            "constrained distributed MD is langevin-only"
    if wide:
        n_layers_w = mp.w_src.shape[0]
        halo_w = n_layers_w * cutoff + skin
        slab_w = box / n_slabs
        assert slab_w >= halo_w, (
            f"wide halo needs slab width {slab_w:.2f} >= "
            f"n_layers*cutoff+skin = {halo_w:.2f}")
        assert n_slabs >= 3 or slab_w >= 2 * halo_w
    else:
        # Layer-wise: strips only reach ADJACENT slabs, so a slab narrower
        # than the interaction halo silently loses neighbors two slabs
        # away (no overflow fires — the atoms simply are not in the env).
        halo_lw = cutoff + skin
        slab_w = box / n_slabs
        assert slab_w >= halo_lw, (
            f"slab width {slab_w:.2f} < cutoff+skin = {halo_lw:.2f}: "
            f"neighbors beyond the adjacent slab would be silently lost "
            f"(use fewer slabs)")
        assert n_slabs >= 3 or slab_w >= 2 * halo_lw
    dt = dt_fs * units.FS
    gamma = friction_per_ps / units.PS
    a = float(np.exp(-gamma * dt))
    b = float(np.sqrt(1.0 - np.exp(-2.0 * gamma * dt)))
    kbt = units.KB * temperature
    d = mp.w_src.shape[-2]
    if integrator == "nose_hoover":
        from gamd_tpu.md.integrators import _YS_WEIGHTS, _nhc_propagate
        freq = friction_per_ps / units.PS          # collision frequency
        q_single = kbt / freq**2
        q_vec = jnp.concatenate([jnp.array([ndf * q_single]),
                                 jnp.full((chain_length - 1,), q_single)])
        ys_w = _YS_WEIGHTS[chain_ys]

    def local_chunk(pos_l, vel_l, valid_l, lidx, ridx, lval, rval, rng,
                    *extra, n_steps, chain=None):
        me = jax.lax.axis_index(axis)
        exchange = _make_exchange(axis, n_slabs, lidx, ridx, lval, rval)
        rng_local = jax.random.fold_in(rng, me)
        noise = None
        if integrator == "langevin":
            noise = jax.random.normal(rng_local, (n_steps,) + pos_l.shape)

        i = 0
        if per_atom_h0:
            h0_own = extra[i]; i += 1
        else:
            h0_own = jnp.broadcast_to(h0_row, (pos_l.shape[0], d))
        aid_l = extra[i] if use_bond else None
        if use_bond:
            i += 1
        if per_atom_mass:
            m = jnp.maximum(extra[i], 1e-6)[:, None]     # pad rows: m=0
        else:
            m = masses_scalar
        sigma_v = jnp.sqrt(kbt / m)

        nbr = None
        ovf0 = jnp.asarray(False)
        if reuse_nbrs:
            # Chunk neighbor list at cutoff+skin (env row identity is
            # fixed within a chunk); each force eval refreshes the
            # true-cutoff mask from current distances.
            posw0 = space.wrap(pos_l, box)
            env0, env_ok0 = exchange(posw0, valid_l)
            r_build = cutoff + skin
            if wide:
                idx0, m0, ovf0 = rect_neighbor_list(
                    env0, env0, env_ok0, box, r_build, nbr_capacity,
                    self_idx=jnp.arange(env0.shape[0], dtype=jnp.int32))
                m0 = m0 & env_ok0[:, None]
            else:
                idx0, m0, ovf0 = rect_neighbor_list(
                    posw0, env0, env_ok0, box, r_build, nbr_capacity,
                    self_idx=jnp.arange(pos_l.shape[0], dtype=jnp.int32))
                m0 = m0 & valid_l[:, None]
            nbr = (idx0, m0)

        bond0 = None
        if reuse_nbrs and not wide and use_bond:
            # idx is fixed for the chunk, aid is constant: the O-H bond
            # channel is chunk-invariant — build it once here.
            aid_env0, _ = exchange(aid_l, valid_l)
            bond0 = water_bond_mask(aid_l[:, None], aid_env0[nbr[0]])

        def poison(f, ovf):
            # Overflow -> NaN forces (see factory docstring).
            return jnp.where(ovf | ovf0, jnp.nan, 1.0) * f * force_unit

        if wide:
            # h0/aid env rows are chunk-invariant: exchange ONCE here so
            # only positions ride a ppermute inside the step loop.
            h0_env, _ = exchange(h0_own, valid_l)
            aid_env = exchange(aid_l, valid_l)[0] if use_bond else None

        if banded:
            e_rows = pos_l.shape[0] + 2 * lidx.shape[0]
            bnd = band or wide_band_default(e_rows, cutoff, slab_w,
                                            halo_w, banded_tile)
            x_center = (me.astype(jnp.float32) + 0.5) * slab_w

            def gnn_force(p):
                posw = space.wrap(p, box)
                f, ovf = _wide_slab_forward_banded(
                    mp, box, cutoff, nbr_capacity, length_mean,
                    length_std, exchange, posw, valid_l, h0_env, aid_env,
                    flip_dir, use_ln, mlp_act, rbf_gap, x_center, bnd,
                    banded_tile, interpret, nbr=nbr)
                return poison(f, ovf)
        elif wide:
            def gnn_force(p):
                posw = space.wrap(p, box)
                f, ovf = _wide_slab_forward(
                    mp, box, cutoff, nbr_capacity, length_mean,
                    length_std, exchange, posw, valid_l, h0_env, aid_env,
                    flip_dir, use_ln, conv_act, mlp_act, rbf_gap,
                    nbr=nbr)
                return poison(f, ovf)
        else:
            def gnn_force(p):
                posw = space.wrap(p, box)
                f, ovf = _slab_forward(
                    mp, box, cutoff, nbr_capacity, length_mean,
                    length_std, exchange, posw, valid_l, h0_own, aid_l,
                    flip_dir, use_ln, conv_act, mlp_act, rbf_gap,
                    nbr=nbr, bond=bond0)
                return poison(f, ovf)

        f = gnn_force(pos_l)

        valid3 = valid_l[:, None]

        def proj_pos(x0, v, hdt):
            x_free = x0 + hdt * v
            if constraint is None:
                return x_free, v
            x_c = constraint.positions(x0, x_free)
            x_c = jnp.where(valid3, x_c, x_free)   # padding rows inert
            return x_c, v + (x_c - x_free) / hdt

        def proj_vel(x, v):
            if constraint is None:
                return v
            return jnp.where(valid3, constraint.velocities(x, v), v)

        if integrator == "nose_hoover":
            def ke2_global(v):
                # padding rows have v=0 and contribute nothing
                return jax.lax.psum(jnp.sum(m * v * v), axis)

            def nhc_half(v, ch):
                xi_c, vxi_c, g_c = ch
                v, xi_c, vxi_c, g_c = _nhc_propagate(
                    v, xi_c, vxi_c, g_c, None, kbt, ndf, q_vec, dt,
                    chain_mts, ys_w, ke2=ke2_global(v))
                return v, (xi_c, vxi_c, g_c)

            def one_step(carry, _):
                p, v, f, ch = carry
                v, ch = nhc_half(v, ch)
                v = v + 0.5 * dt * f / m
                p2 = p + dt * v
                f2 = gnn_force(p2)
                v = v + 0.5 * dt * f2 / m
                v, ch = nhc_half(v, ch)
                return (p2, v, f2, ch), None

            (pos_l, vel_l, _, chain), _ = jax.lax.scan(
                one_step, (pos_l, vel_l, f, chain), None, length=n_steps)
            return pos_l, vel_l, chain

        def one_step(carry, xi):
            # g-BAOAB, mirroring integrators.baoab_langevin step for step
            # (projections are no-ops when constraint is None).
            p, v, f = carry
            v = v + 0.5 * dt * f / m                      # B
            v = proj_vel(p, v)
            p2, v = proj_pos(p, v, 0.5 * dt)              # A
            v = a * v + b * sigma_v * xi                  # O
            v = proj_vel(p2, v)
            p2, v = proj_pos(p2, v, 0.5 * dt)             # A
            f2 = gnn_force(p2)
            v = v + 0.5 * dt * f2 / m                     # B
            v = proj_vel(p2, v)
            return (p2, v, f2), None

        (pos_l, vel_l, _), _ = jax.lax.scan(one_step, (pos_l, vel_l, f),
                                            noise)
        return pos_l, vel_l

    spec3 = P(axis)
    n_extra = int(per_atom_h0) + int(use_bond) + int(per_atom_mass)
    in_specs = (spec3,) * 7 + (P(),) + (spec3,) * n_extra
    nhc = integrator == "nose_hoover"
    if nhc:
        in_specs = in_specs + ((P(),) * 3)   # replicated chain

    def _extras(state):
        extra = ()
        if per_atom_h0:
            extra += (state.aux["h0"],)
        if use_bond:
            extra += (state.aux["aid"],)
        if per_atom_mass:
            extra += (state.aux["mass"],)
        return extra

    if nhc:
        @partial(jax.jit, static_argnames=("n_steps",))
        def chunk_fn(state: SlabState, n_steps: int, chain=None):
            if chain is None:
                chain = chunk_fn.init_chain()
            rng, k_noise = jax.random.split(state.rng)

            def lc(*args):
                *head, xi_c, vxi_c, g_c = args
                return local_chunk(*head, n_steps=n_steps,
                                   chain=(xi_c, vxi_c, g_c))

            mapped = shard_map(
                lc, mesh=mesh, in_specs=in_specs,
                out_specs=(spec3, spec3, (P(), P(), P())),
                check_vma=not banded)
            pos, vel, chain = mapped(
                state.pos, state.vel, state.valid, state.left_idx,
                state.right_idx, state.left_val, state.right_val,
                k_noise, *_extras(state), *chain)
            return state._replace(pos=pos, vel=vel, rng=rng), chain

        def init_chain():
            return (jnp.zeros(chain_length), jnp.zeros(chain_length),
                    jnp.full((chain_length,), -freq**2))

        chunk_fn.init_chain = init_chain
        chunk_fn.needs_chain = True
        return chunk_fn

    @partial(jax.jit, static_argnames=("n_steps",))
    def chunk_fn(state: SlabState, n_steps: int) -> SlabState:
        rng, k_noise = jax.random.split(state.rng)
        mapped = shard_map(
            partial(local_chunk, n_steps=n_steps), mesh=mesh,
            in_specs=in_specs, out_specs=(spec3, spec3),
            # VMA checking stays on except where a per-shard pallas_call
            # (no vma annotation on its out_shape) forces it off.
            check_vma=not banded)
        pos, vel = mapped(state.pos, state.vel, state.valid,
                          state.left_idx, state.right_idx,
                          state.left_val, state.right_val, k_noise,
                          *_extras(state))
        return state._replace(pos=pos, vel=vel, rng=rng)

    chunk_fn.needs_chain = False
    return chunk_fn


def run_halo_gnn_md(mesh, chunk_fn, pos, vel, box, n_slabs, capacity,
                    strip_capacity, halo_width, n_steps, chunk_steps, rng,
                    extras=None, axis: str = "dp", group_size: int = 1):
    """Driver with atom migration: re-sort into slabs every chunk_steps,
    halo-exchange inside chunks (the resort_fn parity item vs
    parallel/halo.py:203 — without it atoms drifting past the strip width
    silently leave their slab's halo).

    extras: per-atom dict sorted alongside atoms each cycle (h0/aid/mass).
    Returns (SlabState final, overflow flag).
    """
    n_atoms = pos.shape[0]
    extras = extras or {}

    def resort(p, v, ex, key):
        return sort_into_slabs(p, v, box, n_slabs, capacity, halo_width,
                               strip_capacity, key, extras=ex,
                               group_size=group_size)

    blk = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def shard(state):
        aux = {k: jax.device_put(v, blk) for k, v in state.aux.items()}
        return state._replace(
            pos=jax.device_put(state.pos, blk),
            vel=jax.device_put(state.vel, blk),
            valid=jax.device_put(state.valid, blk),
            left_idx=jax.device_put(state.left_idx, blk),
            right_idx=jax.device_put(state.right_idx, blk),
            left_val=jax.device_put(state.left_val, blk),
            right_val=jax.device_put(state.right_val, blk),
            rng=jax.device_put(state.rng, rep), aux=aux)

    state = resort(jnp.asarray(pos, jnp.float32),
                   jnp.asarray(vel, jnp.float32), extras, rng)
    overflow = state.overflow
    chain = (chunk_fn.init_chain()
             if getattr(chunk_fn, "needs_chain", False) else None)
    done = 0
    while done < n_steps:
        state = shard(state)
        steps = min(chunk_steps, n_steps - done)
        if chain is not None:
            state, chain = chunk_fn(state, steps, chain)
        else:
            state = chunk_fn(state, steps)
        done += steps
        if done < n_steps:
            # Compact valid rows to the front; with no overflow exactly
            # n_atoms rows are valid, and aux rows travel with their atoms.
            order = jnp.argsort(~state.valid, stable=True)
            ex = {k: v[order][:n_atoms] for k, v in state.aux.items()}
            state = resort(state.pos[order][:n_atoms],
                           state.vel[order][:n_atoms], ex, state.rng)
            overflow = overflow | state.overflow
    return state, overflow
