"""Large-N GNN force path: spatially-banded one-hot gathers.

The megakernel's in-VMEM one-hot gather contracts every edge row against
ALL N node rows — O(N^2) FLOPs, the right trade only at the 258-atom
headline size (VERDICT round-2 weak #6). The XLA `env[idx]` row gather is
FLOP-free but runs far below HBM bandwidth on TPU for random rows
(measured round 2: N=4096 GNN-MD 25.3 ms/step). This module is the scaling
path between them:

  * atoms are SORTED BY X each force call, so a tile of consecutive atom
    rows has all its neighbors inside a contiguous index BAND of height
    ~ N * 2*(cutoff+skin)/box (density fluctuations guarded by an overflow
    flag, same contract as the k_model slice);
  * per tile, the kernel DMAs the band of node rows HBM -> VMEM once
    (regular, large, at bandwidth — NOT per-row gathers) and runs the
    edge-message pipeline with an in-register one-hot contraction against
    the band only: FLOPs drop from O(N^2 D) to O(N BAND D) per layer,
    with BAND ~ N^(2/3) at fixed density;
  * node values stream at bf16 hi/lo (two dots) — the same split the
    megakernel uses to stay inside the 0.6% relative-MAE accuracy budget;
  * the node update (phi MLPs), pre-norm, encoder, and decoder stay in
    XLA: at large N they are dense [N, D] matmuls XLA already schedules
    well, and keeping them out of the kernel avoids the round-1
    fused-conv-layer regression (tiny per-tile phi matmuls stall the MXU).

Weights come packed as ops.pallas_model.MegaParams — one layout, shared
with the megakernel, the XLA reference, and the distributed halo path.

reference: the gather this replaces is DGL's gspmm update_all
(/root/reference/code/nn_module.py:142) which the reference runs
unbatched per graph on CUDA; there is no reference counterpart for the
banded layout (TPU-first design).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gamd_tpu.ops.kernel_util import trace_at_default_matmul_precision

from gamd_tpu.core import space
from gamd_tpu.ops.pallas_model import (MegaParams, decode_nodes,
                                       encode_edges, node_norm)


def _round_up(x, m):
    return -(-x // m) * m


def _silu(x):
    return x * jax.nn.sigmoid(x)


@trace_at_default_matmul_precision
def _banded_msg_kernel(lo_ref, e_ref, idxl_ref, mask_ref, dstc_ref,
                       nodes_hi_hbm, nodes_lo_hbm,
                       w_e1_ref, b_e1_ref, w_e2_ref, b_e2_ref,
                       w_t1_ref, b_t1_ref, w_t2_ref, b_t2_ref,
                       out_ref, band_hi, band_lo, sems, *,
                       tile_n: int, k: int, d: int, band: int,
                       rows_chunk: int):
    """One tile (tile_n atoms): DMA node band, edge MLP chain + one-hot
    gather against the band, masked K-sum into out_ref [tile_n, d]."""
    t = pl.program_id(0)
    # band_layout emits 16-aligned starts (one full sublane tile even for
    # 2-packed bf16 rows); Mosaic needs the hint to prove it may slice a
    # tiled HBM memref at a dynamic row offset.
    lo = pl.multiple_of(lo_ref[t], 16)
    bf = jnp.bfloat16

    cp_hi = pltpu.make_async_copy(nodes_hi_hbm.at[pl.ds(lo, band)],
                                  band_hi, sems.at[0])
    cp_lo = pltpu.make_async_copy(nodes_lo_hbm.at[pl.ds(lo, band)],
                                  band_lo, sems.at[1])
    cp_hi.start()
    cp_lo.start()
    cp_hi.wait()
    cp_lo.wait()

    def mm(a, w_ref):
        return jnp.dot(a.astype(bf), w_ref[:, :].astype(bf),
                       preferred_element_type=jnp.float32)

    e_dim = w_e1_ref.shape[0]
    n_chunks = (tile_n * k) // rows_chunk
    rows_per_atom = rows_chunk // k          # atoms covered per chunk

    def chunk(c, _):
        a0 = c * rows_per_atom
        idxl = idxl_ref[pl.ds(a0, rows_per_atom), :]          # [ra, k]
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_atom, k, band), 2)
        onehot = (iota == idxl[:, :, None]).astype(bf).reshape(
            rows_chunk, band)
        g = (jnp.dot(onehot, band_hi[:, :],
                     preferred_element_type=jnp.float32)
             + jnp.dot(onehot, band_lo[:, :],
                       preferred_element_type=jnp.float32))   # [rc, 2D]
        h_src = g[:, :d]
        src_code = g[:, d:]

        x = e_ref[pl.ds(a0, rows_per_atom), :, :].reshape(rows_chunk, e_dim)
        z = _silu(mm(x, w_e1_ref) + b_e1_ref[0, :])
        z = mm(z, w_e2_ref) + b_e2_ref[0, :]
        z = z + src_code + jnp.repeat(dstc_ref[pl.ds(a0, rows_per_atom), :],
                                      k, axis=0)
        z = _silu(mm(_silu(z), w_t1_ref) + b_t1_ref[0, :])
        m = mm(z, w_t2_ref) + b_t2_ref[0, :]
        msg = (m * h_src).reshape(rows_per_atom, k, d)
        msk = mask_ref[pl.ds(a0, rows_per_atom), :].astype(
            jnp.float32)[:, :, None]
        out_ref[pl.ds(a0, rows_per_atom), :] = jnp.sum(msg * msk, axis=1)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


def banded_conv_message(e, idx_loc, mask, lo, nodes, dst_code, layer,
                        mp: MegaParams, band: int, tile_n: int = 64,
                        rows_chunk: int = 768, interpret: bool = False):
    """Masked sum_k hn[idx] * theta(e, src, dst) with the source rows read
    from a per-tile band of `nodes`.

    Args:
        e:       [N, K, E] encoder output.
        idx_loc: [N, K] BAND-LOCAL neighbor ids (idx_sorted - lo[tile]).
        mask:    [N, K] validity.
        lo:      [T] int32 band start row per tile (8-aligned, clamped).
        nodes:   [Np, 2D] f32 concat(hn, src_affine(hn)) in SORTED order.
        dst_code:[N, H] dst affine rows.
        layer:   conv layer index (selects mp weights).
    Returns:
        agg [N, D] f32.
    """
    n, k, e_dim = e.shape
    d = nodes.shape[1] // 2
    h_dim = mp.w_e1.shape[-1]
    # The [hn | src_affine] pack and the split at `d` assume the node and
    # hidden widths match (true for every GAMD config in the reference).
    assert d == h_dim, (d, h_dim)
    n_tiles = _round_up(n, tile_n) // tile_n
    n_pad = n_tiles * tile_n
    if n_pad != n:
        pad = n_pad - n
        e = jnp.pad(e, ((0, pad), (0, 0), (0, 0)))
        idx_loc = jnp.pad(idx_loc, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        dst_code = jnp.pad(dst_code, ((0, pad), (0, 0)))

    rows_chunk = min(rows_chunk, tile_n * k)
    # rows_chunk must tile the edge rows evenly and stay k-aligned.
    while (tile_n * k) % rows_chunk or rows_chunk % k:
        rows_chunk -= k

    nodes_hi = nodes.astype(jnp.bfloat16)
    nodes_lo = (nodes - nodes_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    lp = lambda a: a[layer]
    row = lambda a: a[layer].reshape(1, -1)

    kernel = functools.partial(
        _banded_msg_kernel, tile_n=tile_n, k=k, d=d, band=band,
        rows_chunk=rows_chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, k, e_dim), lambda t, lo_ref: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda t, lo_ref: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda t, lo_ref: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, h_dim), lambda t, lo_ref: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # nodes_hi (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # nodes_lo (HBM)
            pl.BlockSpec((e_dim, h_dim), lambda t, lo_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda t, lo_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, h_dim), lambda t, lo_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda t, lo_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, h_dim), lambda t, lo_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda t, lo_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, d), lambda t, lo_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t, lo_ref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda t, lo_ref: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band, 2 * d), jnp.bfloat16),
            pltpu.VMEM((band, 2 * d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k * (h_dim * (e_dim + 2 * h_dim + d)
                               + 2 * band * 2 * d),
            bytes_accessed=4 * n * k * e_dim + n_tiles * band * 4 * d,
            transcendentals=3 * n * k * h_dim,
        ),
        # Large N (>= ~32k) spills a few MB past Mosaic's default 16 MB
        # scoped-VMEM stack cap; the v5e has 128 MB of VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(lo.astype(jnp.int32), e.astype(jnp.float32), idx_loc.astype(jnp.int32),
      mask, dst_code.astype(jnp.float32), nodes_hi, nodes_lo,
      lp(mp.w_e1), row(mp.b_e1), lp(mp.w_e2), row(mp.b_e2),
      lp(mp.w_t1), row(mp.b_t1), lp(mp.w_t2), row(mp.b_t2))
    return out[:n]


def band_layout(idx, mask, n, band, tile_n):
    """Per-tile CIRCULAR band offsets + band-local indices for a
    SORTED-frame list.

    The x-sort is periodic: a tile at the box face has neighbors at both
    index extremes, so each tile's sources form a contiguous arc of the
    CIRCULAR index space, not an interval. lo is the arc start (16-aligned
    — a full sublane tile even for 2-packed bf16 node rows, so Mosaic can
    slice the HBM memref at the dynamic offset — mod the padded row
    count); consumers read rows [lo, lo+band) of the node array EXTENDED
    by a `band`-row replica of its head (see banded_forward), and
    idx_loc = (idx - lo) mod np_rows.

    Returns (idx_loc [N,K], lo [T], overflow) where overflow flags any
    valid edge whose source falls outside its tile's band — the caller
    must rebuild with a larger band (same contract as neighbor-capacity
    overflow).
    """
    n_tiles = _round_up(n, tile_n) // tile_n
    np_rows = _round_up(n, 16)
    pad_rows = n_tiles * tile_n - idx.shape[0]
    idx_t = jnp.pad(idx, ((0, pad_rows), (0, 0))) if pad_rows else idx
    mask_t = jnp.pad(mask, ((0, pad_rows), (0, 0))) if pad_rows else mask
    idx_tiles = idx_t.reshape(n_tiles, -1)
    mask_tiles = mask_t.reshape(n_tiles, -1)

    centers = jnp.arange(n_tiles, dtype=jnp.int32) * tile_n + tile_n // 2
    # Signed circular offset of each source from the tile center.
    rel = jnp.mod(idx_tiles - centers[:, None] + n // 2, n) - n // 2
    rel_lo = jnp.min(jnp.where(mask_tiles, rel, n), axis=1)
    rel_hi = jnp.max(jnp.where(mask_tiles, rel, -n), axis=1)
    lo = jnp.mod(((centers + rel_lo) // 16) * 16, np_rows)
    # Margin: up to 15 rows of lo 16-alignment + up to 15 dead pad rows
    # when the arc crosses the n -> np_rows seam.
    overflow = jnp.any(rel_hi - rel_lo + 32 > band)

    idx_loc = jnp.mod(idx_t - jnp.repeat(lo, tile_n)[:, None], np_rows)
    # Out-of-band (only possible when overflow is already flagged, or on
    # masked slots) is clipped so the kernel's one-hot stays in range.
    idx_loc = jnp.clip(idx_loc, 0, band - 1)[:idx.shape[0]]
    return idx_loc, lo, overflow


def banded_forward(pos_s, idx_s, mask, h0_s, mp: MegaParams, box, cutoff,
                   length_mean, length_std, band, tile_n=64, bond=None,
                   rbf_gap=0.025, flip_dir=False, use_ln=True,
                   mlp_act="gelu", interpret=False):
    """Full GAMD forward in the SORTED frame with banded gathers.

    pos_s/idx_s/h0_s are in x-sorted order (idx_s references sorted rows).
    Returns (forces_sorted [N,3], overflow).
    """
    n, k = idx_s.shape
    d = h0_s.shape[-1]
    n_layers = mp.w_src.shape[0]

    rel = space.min_image(pos_s[idx_s] - pos_s[:, None, :], box)
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
    unit = rel / (dist[..., None] + 1e-8)
    if flip_dir:
        unit = -unit
    if cutoff is not None:
        mask = mask & (dist * dist < cutoff * cutoff)
    std = (dist - length_mean) / length_std
    e = encode_edges(mp, unit, std, bond, mlp_act, rbf_gap=rbf_gap)

    idx_loc, lo, overflow = band_layout(idx_s, mask, n, band, tile_n)

    np_rows = _round_up(n, 16)
    h = h0_s
    for layer in range(n_layers):
        hn = node_norm(mp, layer, h, use_ln)
        src_nodes = hn @ mp.w_src[layer] + mp.b_src[layer, 0]
        dst_code = hn @ mp.w_dst[layer] + mp.b_dst[layer, 0]
        nodes = jnp.concatenate([hn, src_nodes], axis=1)
        nodes = jnp.pad(nodes, ((0, np_rows - n), (0, 0)))
        # Circular arcs read past np_rows into a replica of the head rows.
        nodes = jnp.concatenate([nodes, nodes[:band]], axis=0)
        agg = banded_conv_message(e, idx_loc, mask, lo, nodes, dst_code,
                                  layer, mp, band, tile_n,
                                  interpret=interpret)
        pre = hn @ mp.w_pd[layer] + mp.b_pd[layer, 0] \
            + agg @ mp.w_pe[layer] + mp.b_pe[layer, 0]
        h = h + _silu(pre) @ mp.w_p[layer] + mp.b_p[layer, 0]

    return decode_nodes(mp, h, mlp_act), overflow


def make_banded_force_fn(mp: MegaParams, box, cutoff, n_atoms, h0,
                         length_mean, length_std, band=None, tile_n=64,
                         use_bond=False, flip_dir=False, use_ln=True,
                         mlp_act="gelu", force_unit=1.0, interpret=False):
    """(pos, idx, mask) -> (forces, overflow) for the Simulation driver at
    large N: per-call x-sort, neighbor-id remap into the sorted frame,
    banded gathers, unsort.

    h0: [N, D] initial node features in ORIGINAL atom order (broadcast the
    LJ row N times; water one-hot @ encoder). With use_bond, the water
    O-H channel is derived from ORIGINAL atom ids carried through the
    sort. band defaults to ~1.5x the mean slab occupancy within
    2*(cutoff) of a plane, rounded to 128.
    """
    from gamd_tpu.neighbors.topology import water_bond_mask

    if band is None:
        # Arc width ~ atoms within 2*cutoff of the tile's x-window plus the
        # tile's own extent, with 30% margin for density fluctuations.
        frac = min(2.0 * float(cutoff) / float(box), 1.0)
        band = int(_round_up(
            max(int(n_atoms * frac * 1.3) + tile_n + 16, 256), 128))
    band = min(band, _round_up(n_atoms, 16))

    def fn(pos, idx, mask):
        perm = jnp.argsort(pos[:, 0])
        inv = jnp.argsort(perm)
        pos_s = pos[perm]
        idx_s = inv[idx[perm]]
        mask_s = mask[perm]
        h0_s = h0[perm]
        bond = None
        if use_bond:
            aid_s = perm.astype(jnp.int32)
            bond = water_bond_mask(aid_s[:, None], aid_s[idx_s])
        f_s, ovf = banded_forward(
            pos_s, idx_s, mask_s, h0_s, mp, box, cutoff, length_mean,
            length_std, band, tile_n, bond=bond, flip_dir=flip_dir,
            use_ln=use_ln, mlp_act=mlp_act, interpret=interpret)
        return f_s[inv] * force_unit, ovf

    fn.banded_band = band
    return fn
