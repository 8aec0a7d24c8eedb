"""Pallas TPU kernels for the message-passing hot path (the DGL-gspmm
replacement), in increasing order of fusion:

  1. pallas_gather_multiply_aggregate — gather h[idx] * gate, masked K-sum,
     gather as dynamic VMEM row reads (didactic baseline; slow).
  2. fused_edge_mlp_aggregate — theta_edge MLP + gate + masked K-reduction.
  3. fused_conv_message — the whole edge pipeline (edge_affine MLP +
     src/dst codes + theta_edge + gate + reduce) with pre-gathered inputs.
  4. fused_conv_gather_message — #3 plus IN-KERNEL one-hot MXU gathers
     (hi/lo bf16 split keeps row selection fp32-exact). THE PRODUCTION
     KERNEL: device traces showed XLA row gathers (~35 us each at
     [258,64,128]) dominate the MD step; one-hot matmuls cost ~2 us.
  5. fused_conv_layer — #4 plus the node update and residual. Measured
     SLOWER at N=258 (tiny per-tile phi matmuls stall the MXU pipeline);
     retained for tile-size tuning and large-N experiments.

All matmuls run bf16 on the MXU with fp32 accumulation; casts live in VMEM
(a flax-level bf16 policy measured slower than fp32 — HBM convert round
trips). Every kernel has a jax.custom_vjp wrapper whose backward recomputes
through the plain-XLA reference implementation, so training works unchanged
while the forward (the MD hot loop) takes the fused path.

Layout notes (see /opt/skills/guides/pallas_guide.md): last dim 128-aligned
(D = H = 128 for GAMD configs), node tiles sized so TILE_N*K is a multiple
of 8 sublanes; masks handled as f32 multiplies on the VPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gamd_tpu.ops.kernel_util import trace_at_default_matmul_precision

from gamd_tpu.ops.aggregate import gather_multiply_aggregate


def _silu(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Kernel 1: gather * gate -> masked K-sum
# ---------------------------------------------------------------------------

@trace_at_default_matmul_precision
def _gather_agg_kernel(h_ref, e_ref, idx_ref, mask_ref, out_ref, *,
                       tile_n: int, k: int):
    """One grid step handles TILE_N nodes; h is fully VMEM-resident."""
    d = h_ref.shape[-1]
    acc = jnp.zeros((tile_n, d), jnp.float32)
    # K-major accumulation: each k contributes one gathered row per node.
    for kk in range(k):
        rows = []
        for r in range(tile_n):
            rows.append(h_ref[idx_ref[r, kk], :])
        h_src = jnp.stack(rows, axis=0)                     # [TILE_N, D]
        gate = e_ref[:, kk, :]
        m = mask_ref[:, kk].astype(jnp.float32)[:, None]
        acc = acc + m * h_src * gate
    out_ref[:, :] = acc


def pallas_gather_multiply_aggregate(h, e, idx, mask, tile_n: int = 8,
                                     interpret: bool = False):
    """Pallas version of ops.aggregate.gather_multiply_aggregate.

    h [N, D], e [N, K, D], idx [N, K] int32, mask [N, K] -> [N, D].
    N must be divisible by tile_n.
    """
    n, d = h.shape
    k = idx.shape[1]
    assert n % tile_n == 0, (n, tile_n)
    grid = (n // tile_n,)
    kernel = functools.partial(_gather_agg_kernel, tile_n=tile_n, k=k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),           # full h
            pl.BlockSpec((tile_n, k, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(h.astype(jnp.float32), e.astype(jnp.float32),
      idx.astype(jnp.int32), mask)


# ---------------------------------------------------------------------------
# Kernel 2: fused theta_edge MLP + message multiply + masked K-sum
# ---------------------------------------------------------------------------

@trace_at_default_matmul_precision
def _fused_mlp_agg_kernel(pre_ref, hsrc_ref, mask_ref, w1_ref, b1_ref,
                          w2_ref, b2_ref, out_ref, *, tile_n: int, k: int):
    h_dim = w1_ref.shape[0]
    d = w2_ref.shape[1]
    # [TILE_N*K, H] edge pre-activations for this node tile.
    x = pre_ref[:, :, :].reshape(tile_n * k, h_dim)
    z = _silu(x)
    z = jnp.dot(z, w1_ref[:, :], preferred_element_type=jnp.float32)
    z = _silu(z + b1_ref[0, :])
    m = jnp.dot(z, w2_ref[:, :], preferred_element_type=jnp.float32)
    m = m + b2_ref[0, :]
    msg = m.reshape(tile_n, k, d) * hsrc_ref[:, :, :]
    msk = mask_ref[:, :].astype(jnp.float32)[:, :, None]
    out_ref[:, :] = jnp.sum(msg * msk, axis=1)


def _fused_forward(edge_pre, h_src, mask, w1, b1, w2, b2, tile_n, interpret):
    n, k, h_dim = edge_pre.shape
    d = w2.shape[1]
    assert n % tile_n == 0, (n, tile_n)
    kernel = functools.partial(_fused_mlp_agg_kernel, tile_n=tile_n, k=k)
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, k, h_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k * h_dim * (h_dim + d) + 4 * n * k * d,
            bytes_accessed=4 * n * k * (h_dim + 2 * d),
            transcendentals=2 * n * k * h_dim,
        ),
        interpret=interpret,
    )(edge_pre.astype(jnp.float32), h_src.astype(jnp.float32), mask,
      w1.astype(jnp.float32), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(jnp.float32), b2.reshape(1, -1).astype(jnp.float32))


def _fused_reference(edge_pre, h_src, mask, w1, b1, w2, b2):
    """Plain-XLA equivalent (used for the backward pass and testing)."""
    z = _silu(_silu(edge_pre) @ w1 + b1)
    m = z @ w2 + b2
    return jnp.sum(jnp.where(mask[..., None], h_src * m, 0.0), axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_edge_mlp_aggregate(edge_pre, h_src, mask, w1, b1, w2, b2,
                             tile_n: int = 8, interpret: bool = False):
    """out[i] = sum_k mask[i,k] * h_src[i,k] * theta_edge(edge_pre[i,k]).

    theta_edge is the reference's activation-first 2-layer MLP
    (silu -> Linear -> silu -> Linear; /root/reference/code/nn_module.py:98-100).

    Args:
        edge_pre: [N, K, H] summed edge/src/dst affine pre-activations.
        h_src:    [N, K, D] gathered source-node features.
        mask:     [N, K] bool.
        w1 [H, H], b1 [H], w2 [H, D], b2 [D]: theta_edge weights.
    """
    return _fused_forward(edge_pre, h_src, mask, w1, b1, w2, b2, tile_n,
                          interpret)


def _fused_fwd(edge_pre, h_src, mask, w1, b1, w2, b2, tile_n, interpret):
    out = _fused_forward(edge_pre, h_src, mask, w1, b1, w2, b2, tile_n,
                         interpret)
    return out, (edge_pre, h_src, mask, w1, b1, w2, b2)


def _fused_bwd(tile_n, interpret, residuals, g):
    edge_pre, h_src, mask, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(
        lambda ep, hs, a, c, d_, e_: _fused_reference(ep, hs, mask, a, c,
                                                      d_, e_),
        edge_pre, h_src, w1, b1, w2, b2)
    d_ep, d_hs, d_w1, d_b1, d_w2, d_b2 = vjp(g)
    return d_ep, d_hs, None, d_w1, d_b1, d_w2, d_b2


fused_edge_mlp_aggregate.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Kernel 3: whole conv-layer edge pipeline
#   edge_code = edge_affine(e);  pre = edge_code + src_code + dst_code
#   m = theta_edge(pre);         out = sum_k mask * h_src * m
# Everything between the gathers and the aggregated [N, D] output stays in
# VMEM — the [N, K, H] intermediates (8+ MB each per layer in fp32) never
# round-trip HBM, which the bisection profile showed dominates the step.
# ---------------------------------------------------------------------------

@trace_at_default_matmul_precision
def _conv_msg_kernel(e_ref, hsrc_ref, srcc_ref, dstc_ref, mask_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref,
                     w3_ref, b3_ref, w4_ref, b4_ref, out_ref, *,
                     tile_n: int, k: int):
    """Matmuls run in bf16 on the MXU with fp32 accumulation (the cast lives
    in VMEM, unlike the XLA bf16 policy whose convert ops round-trip HBM —
    measured slower than fp32 there). VPU activations stay fp32."""
    e_dim = w1_ref.shape[0]
    h_dim = w1_ref.shape[1]
    d = w4_ref.shape[1]
    bf = jnp.bfloat16

    def mm(a, w_ref):
        return jnp.dot(a.astype(bf), w_ref[:, :].astype(bf),
                       preferred_element_type=jnp.float32)

    x = e_ref[:, :, :].reshape(tile_n * k, e_dim)
    # edge_affine: Linear -> silu -> Linear (MLP hl=2, not act-first)
    z = _silu(mm(x, w1_ref) + b1_ref[0, :])
    z = mm(z, w2_ref) + b2_ref[0, :]
    # + src/dst affine codes
    z = z + srcc_ref[:, :, :].reshape(tile_n * k, h_dim)
    z = z + jnp.repeat(dstc_ref[:, :], k, axis=0)
    # theta_edge: silu -> Linear -> silu -> Linear (act-first, hl=2)
    z = _silu(mm(_silu(z), w3_ref) + b3_ref[0, :])
    m = mm(z, w4_ref) + b4_ref[0, :]
    msg = m.reshape(tile_n, k, d) * hsrc_ref[:, :, :]
    msk = mask_ref[:, :].astype(jnp.float32)[:, :, None]
    out_ref[:, :] = jnp.sum(msg * msk, axis=1)


def _conv_msg_forward(e, h_src, src_code, dst_code, mask,
                      w1, b1, w2, b2, w3, b3, w4, b4, tile_n, interpret):
    n, k, e_dim = e.shape
    h_dim = w1.shape[1]
    d = w4.shape[1]
    # Pad N up to a tile multiple (padded rows have mask False -> zeros).
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        pad = n_pad - n
        e = jnp.pad(e, ((0, pad), (0, 0), (0, 0)))
        h_src = jnp.pad(h_src, ((0, pad), (0, 0), (0, 0)))
        src_code = jnp.pad(src_code, ((0, pad), (0, 0), (0, 0)))
        dst_code = jnp.pad(dst_code, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        out = _conv_msg_forward(e, h_src, src_code, dst_code, mask,
                                w1, b1, w2, b2, w3, b3, w4, b4, tile_n,
                                interpret)
        return out[:n]
    kernel = functools.partial(_conv_msg_kernel, tile_n=tile_n, k=k)
    f32 = lambda a: a.astype(jnp.float32)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, k, e_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k, h_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, h_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e_dim, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k * h_dim * (e_dim + h_dim + h_dim + d),
            bytes_accessed=4 * n * k * (e_dim + h_dim + 2 * d),
            transcendentals=3 * n * k * h_dim,
        ),
        interpret=interpret,
    )(f32(e), f32(h_src), f32(src_code), f32(dst_code), mask,
      f32(w1), row(b1), f32(w2), row(b2), f32(w3), row(b3), f32(w4), row(b4))


def _conv_msg_reference(e, h_src, src_code, dst_code, mask,
                        w1, b1, w2, b2, w3, b3, w4, b4):
    z = _silu(e @ w1 + b1) @ w2 + b2
    z = z + src_code + dst_code[:, None, :]
    z = _silu(_silu(z) @ w3 + b3) @ w4 + b4
    return jnp.sum(jnp.where(mask[..., None], h_src * z, 0.0), axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def fused_conv_message(e, h_src, src_code, dst_code, mask,
                       w1, b1, w2, b2, w3, b3, w4, b4,
                       tile_n: int = 16, interpret: bool = False):
    """Fused edge pipeline of one EdgeGatedConv layer (see module docstring).

    Args:
        e:        [N, K, E] edge embeddings.
        h_src:    [N, K, D] gathered (normalized) source-node features.
        src_code: [N, K, H] gathered src_affine outputs.
        dst_code: [N, H] dst_affine outputs (broadcast over K).
        mask:     [N, K] bool aggregation mask.
        w1..b4:   edge_affine (w1,b1,w2,b2) and theta_edge (w3,b3,w4,b4).
    """
    return _conv_msg_forward(e, h_src, src_code, dst_code, mask,
                             w1, b1, w2, b2, w3, b3, w4, b4, tile_n,
                             interpret)


def _conv_msg_fwd(e, h_src, src_code, dst_code, mask,
                  w1, b1, w2, b2, w3, b3, w4, b4, tile_n, interpret):
    out = _conv_msg_forward(e, h_src, src_code, dst_code, mask,
                            w1, b1, w2, b2, w3, b3, w4, b4, tile_n,
                            interpret)
    return out, (e, h_src, src_code, dst_code, mask,
                 w1, b1, w2, b2, w3, b3, w4, b4)


def _conv_msg_bwd(tile_n, interpret, residuals, g):
    (e, h_src, src_code, dst_code, mask,
     w1, b1, w2, b2, w3, b3, w4, b4) = residuals
    _, vjp = jax.vjp(
        lambda *args: _conv_msg_reference(args[0], args[1], args[2], args[3],
                                          mask, *args[4:]),
        e, h_src, src_code, dst_code, w1, b1, w2, b2, w3, b3, w4, b4)
    grads = vjp(g)
    return (grads[0], grads[1], grads[2], grads[3], None) + tuple(grads[4:])


fused_conv_message.defvjp(_conv_msg_fwd, _conv_msg_bwd)


# ---------------------------------------------------------------------------
# Kernel 4: conv layer with IN-KERNEL one-hot MXU gather.
# Device traces show XLA's row gather for h_src/src_code costs ~35 us per
# [N,K,128] gather at N=258 (~250 us/step total) — the dominant step cost.
# Expressing the gather as onehot(idx) @ nodes on the MXU replaces each
# 35 us gather with a ~2 us bf16 matmul. The one-hot is built per tile from
# idx via broadcasted_iota compare; node features are VMEM-resident and
# split hi/lo so two bf16 matmuls reconstruct fp32-accurate rows (a 0/1
# one-hot is exact in bf16, so each matmul is exact row selection).
# ---------------------------------------------------------------------------

@trace_at_default_matmul_precision
def _conv_msg_gather_kernel(e_ref, idx_ref, mask_ref, nodes_hi_ref,
                            nodes_lo_ref, dstc_ref,
                            w1_ref, b1_ref, w2_ref, b2_ref,
                            w3_ref, b3_ref, w4_ref, b4_ref, out_ref, *,
                            tile_n: int, k: int, d: int):
    e_dim = w1_ref.shape[0]
    h_dim = w1_ref.shape[1]
    n_pad = nodes_hi_ref.shape[0]
    rows = tile_n * k
    bf = jnp.bfloat16

    def mm(a, w_ref):
        return jnp.dot(a.astype(bf), w_ref[:, :].astype(bf),
                       preferred_element_type=jnp.float32)

    # One-hot gather of [hn | src_code] rows via the MXU. (Built with a 3-D
    # iota: collapsing leading dims is a supported Mosaic reshape, whereas
    # [TN, K]i32 -> [TN*K, 1] is not.)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k, n_pad), 2)
    onehot = (iota == idx_ref[:, :][:, :, None]).astype(bf).reshape(
        rows, n_pad)
    g = (jnp.dot(onehot, nodes_hi_ref[:, :], preferred_element_type=jnp.float32)
         + jnp.dot(onehot, nodes_lo_ref[:, :],
                   preferred_element_type=jnp.float32))   # [rows, 2D]
    h_src = g[:, :d]
    src_code = g[:, d:]

    x = e_ref[:, :, :].reshape(rows, e_dim)
    z = _silu(mm(x, w1_ref) + b1_ref[0, :])
    z = mm(z, w2_ref) + b2_ref[0, :]
    z = z + src_code + jnp.repeat(dstc_ref[:, :], k, axis=0)
    z = _silu(mm(_silu(z), w3_ref) + b3_ref[0, :])
    m = mm(z, w4_ref) + b4_ref[0, :]
    msg = (m * h_src).reshape(tile_n, k, d)
    msk = mask_ref[:, :].astype(jnp.float32)[:, :, None]
    out_ref[:, :] = jnp.sum(msg * msk, axis=1)


def _round_up(x, m):
    return -(-x // m) * m


def _conv_msg_gather_forward(e, idx, mask, hn, src_nodes, dst_code,
                             w1, b1, w2, b2, w3, b3, w4, b4, tile_n,
                             interpret):
    n, k, e_dim = e.shape
    h_dim = w1.shape[1]
    d = hn.shape[1]
    n_tiles = _round_up(n, tile_n)
    n_nodes_pad = _round_up(n, 128)

    if n_tiles != n:
        pad = n_tiles - n
        e = jnp.pad(e, ((0, pad), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        dst_code = jnp.pad(dst_code, ((0, pad), (0, 0)))

    nodes = jnp.concatenate([hn, src_nodes], axis=1)          # [N, 2D]
    nodes = jnp.pad(nodes, ((0, n_nodes_pad - n), (0, 0)))
    nodes_hi = nodes.astype(jnp.bfloat16)
    nodes_lo = (nodes - nodes_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    kernel = functools.partial(_conv_msg_gather_kernel, tile_n=tile_n, k=k,
                               d=d)
    f32 = lambda a: a.astype(jnp.float32)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, k, e_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_nodes_pad, 2 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_nodes_pad, 2 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, h_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e_dim, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k * (h_dim * (e_dim + 2 * h_dim + d)
                               + 2 * n_nodes_pad * 2 * d),
            bytes_accessed=4 * n * k * e_dim,
            transcendentals=3 * n * k * h_dim,
        ),
        interpret=interpret,
    )(f32(e), idx.astype(jnp.int32), mask, nodes_hi, nodes_lo, f32(dst_code),
      f32(w1), row(b1), f32(w2), row(b2), f32(w3), row(b3), f32(w4), row(b4))
    return out[:n]


def _conv_msg_gather_reference(e, idx, mask, hn, src_nodes, dst_code,
                               w1, b1, w2, b2, w3, b3, w4, b4):
    h_src = hn[idx]
    src_code = src_nodes[idx]
    z = _silu(e @ w1 + b1) @ w2 + b2
    z = z + src_code + dst_code[:, None, :]
    z = _silu(_silu(z) @ w3 + b3) @ w4 + b4
    return jnp.sum(jnp.where(mask[..., None], h_src * z, 0.0), axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15))
def fused_conv_gather_message(e, idx, mask, hn, src_nodes, dst_code,
                              w1, b1, w2, b2, w3, b3, w4, b4,
                              tile_n: int = 16, interpret: bool = False):
    """Full conv-layer edge pipeline INCLUDING the neighbor gathers.

    Args:
        e:         [N, K, E] edge embeddings.
        idx:       [N, K] int32 neighbor ids.
        mask:      [N, K] bool aggregation mask.
        hn:        [N, D] normalized node features (gathered in-kernel).
        src_nodes: [N, H] src_affine(hn) (gathered in-kernel).
        dst_code:  [N, H] dst_affine(hn).
    """
    return _conv_msg_gather_forward(e, idx, mask, hn, src_nodes, dst_code,
                                    w1, b1, w2, b2, w3, b3, w4, b4,
                                    tile_n, interpret)


def _conv_gather_fwd(e, idx, mask, hn, src_nodes, dst_code,
                     w1, b1, w2, b2, w3, b3, w4, b4, tile_n, interpret):
    out = _conv_msg_gather_forward(e, idx, mask, hn, src_nodes, dst_code,
                                   w1, b1, w2, b2, w3, b3, w4, b4,
                                   tile_n, interpret)
    return out, (e, idx, mask, hn, src_nodes, dst_code,
                 w1, b1, w2, b2, w3, b3, w4, b4)


def _dsilu(x):
    """d/dx silu(x) = sigmoid(x) * (1 + x * (1 - sigmoid(x)))."""
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


@trace_at_default_matmul_precision
def _conv_msg_gather_bwd_kernel(
        g_ref, e_ref, idx_ref, mask_ref, nodes_hi_ref, nodes_lo_ref,
        dstc_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
        w4_ref, b4_ref, w1t_ref, w2t_ref, w3t_ref, w4t_ref,
        ge_ref, gdst_ref, gnodes_ref,
        gw1_ref, gb1_ref, gw2_ref, gb2_ref,
        gw3_ref, gb3_ref, gw4_ref, gb4_ref, *,
        tile_n: int, k: int, d: int):
    """REAL backward for fused_conv_gather_message (the training hot path).

    Recomputes the tile's edge pipeline entirely in VMEM (the [N, K, *]
    edge stream never materializes in HBM — same property the reference's
    fused DGL backward kernels have, nn_module.py:142) and emits input
    gradients plus PER-TILE partial weight/node gradients. Partials are
    summed by one XLA reduction outside the kernel: per-tile outputs keep
    the kernel free of cross-grid-step accumulator state, which keeps it
    correct under jax.vmap's prepended batch grid dimension.
    """
    e_dim = w1_ref.shape[0]
    n_pad = nodes_hi_ref.shape[0]
    rows = tile_n * k
    bf = jnp.bfloat16

    def mm(a, w_ref):
        return jnp.dot(a.astype(bf), w_ref[:, :].astype(bf),
                       preferred_element_type=jnp.float32)

    # ---- recompute the forward edge pipeline (see _conv_msg_gather_kernel)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k, n_pad), 2)
    onehot = (iota == idx_ref[:, :][:, :, None]).astype(bf).reshape(
        rows, n_pad)
    gfull = (jnp.dot(onehot, nodes_hi_ref[:, :],
                     preferred_element_type=jnp.float32)
             + jnp.dot(onehot, nodes_lo_ref[:, :],
                       preferred_element_type=jnp.float32))  # [rows, D+H]
    h_src = gfull[:, :d]
    src_code = gfull[:, d:]

    x = e_ref[:, :, :].reshape(rows, e_dim)
    s1 = mm(x, w1_ref) + b1_ref[0, :]
    z1 = _silu(s1)
    z2 = mm(z1, w2_ref) + b2_ref[0, :] + src_code \
        + jnp.repeat(dstc_ref[:, :], k, axis=0)
    a2 = _silu(z2)
    s3 = mm(a2, w3_ref) + b3_ref[0, :]
    z3 = _silu(s3)
    m = mm(z3, w4_ref) + b4_ref[0, :]

    # ---- reverse sweep -------------------------------------------------
    # Mask applied in the 3-D domain ([TN,K,1] broadcast, same as the
    # forward kernel) then collapsed: [TN,K] -> [rows,1] is NOT a
    # supported Mosaic relayout (measured on-chip: "infer-vector-layout:
    # unsupported shape cast vector<TNxK> -> vector<rowsx1>"), while
    # leading-dim collapse/expand is.
    g3 = jnp.repeat(g_ref[:, :], k, axis=0).reshape(tile_n, k, d)
    msk3 = mask_ref[:, :].astype(jnp.float32)[:, :, None]
    g_rows = (g3 * msk3).reshape(rows, d)                    # [rows, D]
    g_m = g_rows * h_src
    g_hsrc = g_rows * m

    def wgrad(acts, grads):
        # [rows, X]^T @ [rows, Y] weight-gradient contraction on the MXU.
        return jax.lax.dot_general(
            acts.astype(bf), grads.astype(bf), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    g_z3 = mm(g_m, w4t_ref)
    gw4_ref[0, :, :] = wgrad(z3, g_m)
    gb4_ref[0, 0, :] = jnp.sum(g_m, axis=0)

    g_s3 = g_z3 * _dsilu(s3)
    g_a2 = mm(g_s3, w3t_ref)
    gw3_ref[0, :, :] = wgrad(a2, g_s3)
    gb3_ref[0, 0, :] = jnp.sum(g_s3, axis=0)

    g_z2 = g_a2 * _dsilu(z2)
    gdst_ref[:, :] = jnp.sum(g_z2.reshape(tile_n, k, -1), axis=1)
    g_z1 = mm(g_z2, w2t_ref)
    gw2_ref[0, :, :] = wgrad(z1, g_z2)
    gb2_ref[0, 0, :] = jnp.sum(g_z2, axis=0)

    g_s1 = g_z1 * _dsilu(s1)
    ge_ref[:, :, :] = mm(g_s1, w1t_ref).reshape(tile_n, k, e_dim)
    gw1_ref[0, :, :] = wgrad(x, g_s1)
    gb1_ref[0, 0, :] = jnp.sum(g_s1, axis=0)

    # Scatter-add to nodes = one-hot transpose matmul (exact row routing,
    # same hi/lo-free trick: grads tolerate bf16 onehot since 0/1 is exact).
    g_cat = jnp.concatenate([g_hsrc, g_z2], axis=1)          # [rows, D+H]
    gnodes_ref[0, :, :] = jax.lax.dot_general(
        onehot, g_cat.astype(bf), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [n_pad, D+H]


def _conv_msg_gather_backward(g, e, idx, mask, hn, src_nodes, dst_code,
                              w1, b1, w2, b2, w3, b3, w4, b4, tile_n,
                              interpret):
    n, k, e_dim = e.shape
    h_dim = w1.shape[1]
    d = hn.shape[1]
    n_tiles_r = _round_up(n, tile_n)
    n_nodes_pad = _round_up(n, 128)
    n_tiles = n_tiles_r // tile_n

    if n_tiles_r != n:
        pad = n_tiles_r - n
        g = jnp.pad(g, ((0, pad), (0, 0)))
        e = jnp.pad(e, ((0, pad), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        dst_code = jnp.pad(dst_code, ((0, pad), (0, 0)))

    nodes = jnp.concatenate([hn, src_nodes], axis=1)
    nodes = jnp.pad(nodes, ((0, n_nodes_pad - n), (0, 0)))
    nodes_hi = nodes.astype(jnp.bfloat16)
    nodes_lo = (nodes - nodes_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    kernel = functools.partial(_conv_msg_gather_bwd_kernel, tile_n=tile_n,
                               k=k, d=d)
    f32 = lambda a: a.astype(jnp.float32)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    tile = lambda *s: pl.BlockSpec((tile_n,) + s,
                                   lambda i: (i,) + (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    whole = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    part = lambda *s: pl.BlockSpec((1,) + s, lambda i: (i,) + (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile(d), tile(k, e_dim), tile(k), tile(k),
            whole(n_nodes_pad, d + h_dim), whole(n_nodes_pad, d + h_dim),
            tile(h_dim),
            whole(e_dim, h_dim), whole(1, h_dim),
            whole(h_dim, h_dim), whole(1, h_dim),
            whole(h_dim, h_dim), whole(1, h_dim),
            whole(h_dim, d), whole(1, d),
            whole(h_dim, e_dim), whole(h_dim, h_dim),
            whole(h_dim, h_dim), whole(d, h_dim),
        ],
        out_specs=[
            tile(k, e_dim), tile(h_dim), part(n_nodes_pad, d + h_dim),
            part(e_dim, h_dim), part(1, h_dim),
            part(h_dim, h_dim), part(1, h_dim),
            part(h_dim, h_dim), part(1, h_dim),
            part(h_dim, d), part(1, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles_r, k, e_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles_r, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, n_nodes_pad, d + h_dim),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, e_dim, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, h_dim, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, h_dim, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, h_dim, d), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * k * (h_dim * (e_dim + 2 * h_dim + d)
                               + 2 * n_nodes_pad * 2 * d),
            bytes_accessed=8 * n * k * e_dim,
            transcendentals=6 * n * k * h_dim,
        ),
        interpret=interpret,
    )(f32(g), f32(e), idx.astype(jnp.int32), mask, nodes_hi, nodes_lo,
      f32(dst_code), f32(w1), row(b1), f32(w2), row(b2), f32(w3), row(b3),
      f32(w4), row(b4), f32(w1.T), f32(w2.T), f32(w3.T), f32(w4.T))

    (ge, gdst, gnodes_p, gw1, gb1, gw2, gb2, gw3, gb3, gw4, gb4) = outs
    gnodes = jnp.sum(gnodes_p, axis=0)[:n]
    return (ge[:n], gnodes[:, :d], gnodes[:, d:], gdst[:n],
            jnp.sum(gw1, axis=0), jnp.sum(gb1, axis=0)[0],
            jnp.sum(gw2, axis=0), jnp.sum(gb2, axis=0)[0],
            jnp.sum(gw3, axis=0), jnp.sum(gb3, axis=0)[0],
            jnp.sum(gw4, axis=0), jnp.sum(gb4, axis=0)[0])


def _conv_gather_bwd(tile_n, interpret, residuals, g):
    (e, idx, mask, hn, src_nodes, dst_code,
     w1, b1, w2, b2, w3, b3, w4, b4) = residuals
    grads = _conv_msg_gather_backward(
        g, e, idx, mask, hn, src_nodes, dst_code,
        w1, b1, w2, b2, w3, b3, w4, b4, tile_n, interpret)
    (ge, ghn, gsrc, gdst, gw1, gb1, gw2, gb2, gw3, gb3, gw4, gb4) = grads
    return (ge, None, None, ghn, gsrc, gdst,
            gw1, gb1, gw2, gb2, gw3, gb3, gw4, gb4)


fused_conv_gather_message.defvjp(_conv_gather_fwd, _conv_gather_bwd)


# ---------------------------------------------------------------------------
# Kernel 5: FULL conv layer — kernel 4 plus the node update and residual:
#     h'[i] = h[i] + phi(phi_dst(hn[i]) + phi_edge(agg[i]))
# Between layers only the [N, D] node arrays and three small node-level
# projections remain in XLA; all [N, K, *] work stays in VMEM.
# ---------------------------------------------------------------------------

@trace_at_default_matmul_precision
def _conv_layer_kernel(e_ref, idx_ref, mask_ref, nodes_hi_ref, nodes_lo_ref,
                       dstc_ref, h_ref, hn_ref,
                       w1_ref, b1_ref, w2_ref, b2_ref,
                       w3_ref, b3_ref, w4_ref, b4_ref,
                       wpd_ref, bpd_ref, wpe_ref, bpe_ref, wp_ref, bp_ref,
                       out_ref, *, tile_n: int, k: int, d: int):
    e_dim = w1_ref.shape[0]
    n_pad = nodes_hi_ref.shape[0]
    rows = tile_n * k
    bf = jnp.bfloat16

    def mm(a, w_ref):
        return jnp.dot(a.astype(bf), w_ref[:, :].astype(bf),
                       preferred_element_type=jnp.float32)

    iota = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k, n_pad), 2)
    onehot = (iota == idx_ref[:, :][:, :, None]).astype(bf).reshape(
        rows, n_pad)
    g = (jnp.dot(onehot, nodes_hi_ref[:, :],
                 preferred_element_type=jnp.float32)
         + jnp.dot(onehot, nodes_lo_ref[:, :],
                   preferred_element_type=jnp.float32))
    h_src = g[:, :d]
    src_code = g[:, d:]

    x = e_ref[:, :, :].reshape(rows, e_dim)
    z = _silu(mm(x, w1_ref) + b1_ref[0, :])
    z = mm(z, w2_ref) + b2_ref[0, :]
    z = z + src_code + jnp.repeat(dstc_ref[:, :], k, axis=0)
    z = _silu(mm(_silu(z), w3_ref) + b3_ref[0, :])
    m = mm(z, w4_ref) + b4_ref[0, :]
    msg = (m * h_src).reshape(tile_n, k, d)
    msk = mask_ref[:, :].astype(jnp.float32)[:, :, None]
    agg = jnp.sum(msg * msk, axis=1)                       # [TN, D]

    # node update: phi(phi_dst(hn) + phi_edge(agg)) + residual h
    hn_t = hn_ref[:, :]
    pre = (mm(hn_t, wpd_ref) + bpd_ref[0, :]
           + mm(agg, wpe_ref) + bpe_ref[0, :])
    out = mm(_silu(pre), wp_ref) + bp_ref[0, :]
    out_ref[:, :] = h_ref[:, :] + out


def _conv_layer_forward(e, idx, mask, h, hn, src_nodes, dst_code, weights,
                        tile_n, interpret):
    (w1, b1, w2, b2, w3, b3, w4, b4,
     wpd, bpd, wpe, bpe, wp, bp) = weights
    n, k, e_dim = e.shape
    h_dim = w1.shape[1]
    d = hn.shape[1]
    n_tiles = _round_up(n, tile_n)
    n_nodes_pad = _round_up(n, 128)

    if n_tiles != n:
        pad = n_tiles - n
        e = jnp.pad(e, ((0, pad), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        dst_code = jnp.pad(dst_code, ((0, pad), (0, 0)))
        h = jnp.pad(h, ((0, pad), (0, 0)))
        hn_t = jnp.pad(hn, ((0, pad), (0, 0)))
    else:
        hn_t = hn

    nodes = jnp.concatenate([hn, src_nodes], axis=1)
    nodes = jnp.pad(nodes, ((0, n_nodes_pad - n), (0, 0)))
    nodes_hi = nodes.astype(jnp.bfloat16)
    nodes_lo = (nodes - nodes_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    kernel = functools.partial(_conv_layer_kernel, tile_n=tile_n, k=k, d=d)
    f32 = lambda a: a.astype(jnp.float32)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    tile2 = lambda w: pl.BlockSpec((tile_n, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, k, e_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(), full(),                          # nodes hi/lo
            tile2(h_dim),                            # dst_code
            tile2(d),                                # h (residual)
            tile2(d),                                # hn (phi_dst input)
            full(), full(), full(), full(),          # w1 b1 w2 b2
            full(), full(), full(), full(),          # w3 b3 w4 b4
            full(), full(), full(), full(),          # wpd bpd wpe bpe
            full(), full(),                          # wp bp
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, d), jnp.float32),
        interpret=interpret,
    )(e if e.dtype == jnp.bfloat16 else f32(e),
      idx.astype(jnp.int32), mask, nodes_hi, nodes_lo, f32(dst_code),
      f32(h), f32(hn_t),
      f32(w1), row(b1), f32(w2), row(b2), f32(w3), row(b3), f32(w4), row(b4),
      f32(wpd), row(bpd), f32(wpe), row(bpe), f32(wp), row(bp))
    return out[:n]


def _conv_layer_reference(e, idx, mask, h, hn, src_nodes, dst_code, weights):
    (w1, b1, w2, b2, w3, b3, w4, b4,
     wpd, bpd, wpe, bpe, wp, bp) = weights
    e = e.astype(jnp.float32)
    h_src = hn[idx]
    src_code = src_nodes[idx]
    z = _silu(e @ w1 + b1) @ w2 + b2
    z = z + src_code + dst_code[:, None, :]
    z = _silu(_silu(z) @ w3 + b3) @ w4 + b4
    agg = jnp.sum(jnp.where(mask[..., None], h_src * z, 0.0), axis=1)
    pre = hn @ wpd + bpd + agg @ wpe + bpe
    return h + _silu(pre) @ wp + bp


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_conv_layer(e, idx, mask, h, hn, src_nodes, dst_code, weights,
                     tile_n: int = 16, interpret: bool = False):
    """One complete EdgeGatedConv layer (message pipeline + node update +
    residual) as a single Pallas program. `weights` is the 14-tuple
    (edge_affine w1,b1,w2,b2; theta w3,b3,w4,b4; phi_dst wpd,bpd;
    phi_edge wpe,bpe; phi wp,bp). Activation: silu."""
    return _conv_layer_forward(e, idx, mask, h, hn, src_nodes, dst_code,
                               weights, tile_n, interpret)


def _conv_layer_fwd(e, idx, mask, h, hn, src_nodes, dst_code, weights,
                    tile_n, interpret):
    out = _conv_layer_forward(e, idx, mask, h, hn, src_nodes, dst_code,
                              weights, tile_n, interpret)
    return out, (e, idx, mask, h, hn, src_nodes, dst_code, weights)


def _conv_layer_bwd(tile_n, interpret, residuals, g):
    e, idx, mask, h, hn, src_nodes, dst_code, weights = residuals
    _, vjp = jax.vjp(
        lambda ee, hh, hhn, ss, dd, ww: _conv_layer_reference(
            ee, idx, mask, hh, hhn, ss, dd, ww),
        e, h, hn, src_nodes, dst_code, weights)
    d_e, d_h, d_hn, d_src, d_dst, d_w = vjp(g)
    return d_e, None, None, d_h, d_hn, d_src, d_dst, d_w


fused_conv_layer.defvjp(_conv_layer_fwd, _conv_layer_bwd)
