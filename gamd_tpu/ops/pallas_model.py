"""Whole-force-model Pallas megakernel: ONE device program from positions to
per-atom forces.

Round-1 traces put the LJ-258 MD step at ~390 us: 4x28 us conv kernels +
~85 us feature/encoder + ~40 us of node-level XLA between kernels, dominated
by kernel launch boundaries and HBM re-reads of the [N, K, E] edge embedding
(4.2 MB bf16) between layers. This kernel runs the ENTIRE GAMDNet forward —
edge featurization + encoder MLP + LayerNorm, `conv_layers` EdgeGatedConv
layers (in-kernel node LayerNorm / folded BatchNorm, one-hot MXU gathers,
edge pipeline, masked aggregation, node update + residual), and the decoder
MLP — in a single pallas_call with the edge embedding VMEM-resident
throughout. Grid = (replicas,): each grid step is one independent system,
which is also the explicit batch dimension that fixes the vmap-lowered
replica collapse (round-1: 8 vmapped replicas -> 208 steps/s each).

Math parity targets (reference: /root/reference/code/nn_module.py):
  * edge features [unit(3), std_dist, rbf(40), bond?] -> encoder MLP hl=3
    (gelu) + LayerNorm (:584-600,435-449);
  * per layer: theta_edge(edge_affine(e) + src_code + dst_code) gate,
    masked K-sum, phi node update + residual (:130-147), pre-norm
    LayerNorm/BatchNorm (:198-206);
  * decoder MLP hl=2 (gelu) (:601, MLP builder :21-75).

All matmuls run bf16 on the MXU with fp32 accumulation; one-hot gathers use
the hi/lo bf16 split so row selection stays fp32-exact (see ops.pallas_mp).
gelu is the tanh approximation (Mosaic has no erf; error ~1e-3, below the
bf16 noise floor). Force denormalization (scaler std/mean + unit conversion)
is folded into the decoder's final affine at pack time — zero runtime cost.

The kernel also computes the true-cutoff live mask from current positions
(replacing neighbors/dense.refresh_mask in the MD loop), so the Verlet-skin
mask refresh costs nothing extra: the distances are already in registers.

VMEM budget at LJ-258 (K=64, D=E=H=128, 4 layers): e 4.5 MB + weights
~3 MB + node/scratch ~1.5 MB + per-tile values ~2 MB = ~11 MB of 16 MB.
"""

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gamd_tpu.ops.kernel_util import trace_at_default_matmul_precision


def _round_up(x, m):
    return -(-x // m) * m


def _gelu_tanh(x):
    c = np.float32(np.sqrt(2.0 / np.pi))
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _silu(x):
    return x * jax.nn.sigmoid(x)


_ACTS = {"gelu": _gelu_tanh, "silu": _silu}


class MegaParams(NamedTuple):
    """GAMDNet weights re-packed for the megakernel (layer axes stacked)."""

    # encoder
    centers: jax.Array       # [1, 128] RBF centers (zero-padded)
    w_geo: jax.Array         # [8, H]: rows 0-2 unit, 3 std-dist, 4 bond
    w_rbf: jax.Array         # [128, H] (rows >= n_rbf are zero)
    b0: jax.Array            # [1, H]
    w1: jax.Array            # [H, H]
    b1: jax.Array            # [1, H]
    w2: jax.Array            # [H, E]
    b2: jax.Array            # [1, E]
    eln_s: jax.Array         # [1, E] edge LayerNorm scale
    eln_b: jax.Array         # [1, E]
    # conv layers (leading axis L)
    nln_s: jax.Array         # [L, 1, D] node norm scale (LN) / folded BN a
    nln_b: jax.Array         # [L, 1, D]
    w_src: jax.Array         # [L, D, H]
    b_src: jax.Array         # [L, 1, H]
    w_dst: jax.Array         # [L, D, H]
    b_dst: jax.Array         # [L, 1, H]
    w_e1: jax.Array          # [L, E, H]
    b_e1: jax.Array          # [L, 1, H]
    w_e2: jax.Array          # [L, H, H]
    b_e2: jax.Array          # [L, 1, H]
    w_t1: jax.Array          # [L, H, H]
    b_t1: jax.Array          # [L, 1, H]
    w_t2: jax.Array          # [L, H, D]
    b_t2: jax.Array          # [L, 1, D]
    w_pd: jax.Array          # [L, D, H]
    b_pd: jax.Array          # [L, 1, H]
    w_pe: jax.Array          # [L, D, H]
    b_pe: jax.Array          # [L, 1, H]
    w_p: jax.Array           # [L, H, D]
    b_p: jax.Array           # [L, 1, D]
    # decoder (final affine may fold force denormalization)
    wd0: jax.Array           # [D, H]
    bd0: jax.Array           # [1, H]
    wd1: jax.Array           # [H, 128] (cols 0-2 live)
    bd1: jax.Array           # [1, 128]
    # kernel-only prepack: [ws_hi; ws_lo; ws_hi] stacked along the input
    # axis (bf16) so the conv layers' hi/lo src affine runs as ONE K=3D
    # MXU dot over [ghi|ghi|glo] instead of three K=D dots.
    w_src3: jax.Array        # [L, 3D, H] bf16


def pack_params(params, cfg, batch_stats=None, force_std=None,
                force_mean=None, unit: float = 1.0):
    """Re-pack a GAMDNet flax param tree (gamd_tpu.models.gnn) for the
    megakernel. If force_std/mean are given, the decoder's last affine
    absorbs `pred * std + mean` and the `unit` conversion, so the kernel
    emits forces in the caller's units directly.

    BatchNorm (use_layer_norm=False) folds its eval-mode normalization into
    the per-feature affine: a = scale/sqrt(var+eps), b = bias - mean*a.
    """
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    row = lambda a: f32(a).reshape(1, -1)
    h_dim = cfg.hidden_dim
    n_rbf = cfg.n_rbf if cfg.expand_edge else 0

    w0 = f32(params["edge_encoder_w0"])       # [3+1+n_rbf(+1 bond), H]
    w_geo = jnp.zeros((8, h_dim), jnp.float32)
    w_geo = w_geo.at[:4].set(w0[:4])
    if w0.shape[0] > 4 + n_rbf:               # trailing bond-channel row
        w_geo = w_geo.at[4].set(w0[4 + n_rbf])
    w_rbf = jnp.zeros((128, h_dim), jnp.float32)
    if n_rbf:
        w_rbf = w_rbf.at[:n_rbf].set(w0[4:4 + n_rbf])
    centers = np.zeros((1, 128), np.float32)
    if n_rbf:
        centers[0, :n_rbf] = np.linspace(cfg.rbf_low, cfg.rbf_high, n_rbf)

    gc = params["graph_conv"]
    ln_s, ln_b = [], []
    for layer in range(cfg.conv_layers):
        norm = gc[f"norm_{layer}"]
        if cfg.use_layer_norm:
            ln_s.append(row(norm["scale"]))
            ln_b.append(row(norm["bias"]))
        else:
            stats = batch_stats[f"graph_conv"][f"norm_{layer}"]
            a = f32(norm["scale"]) / jnp.sqrt(f32(stats["var"]) + 1e-5)
            ln_s.append(row(a))
            ln_b.append(row(f32(norm["bias"]) - f32(stats["mean"]) * a))

    def stack(fn):
        return jnp.stack([fn(gc[f"conv_{l}"]) for l in range(cfg.conv_layers)])

    dec = params["graph_decoder"]
    wd1 = f32(dec["Dense_1"]["kernel"])       # [H, 3]
    bd1 = f32(dec["Dense_1"]["bias"])         # [3]
    if force_std is not None:
        scale = jnp.asarray(force_std, jnp.float32) * unit
        wd1 = wd1 * scale
        bd1 = bd1 * scale + jnp.asarray(force_mean, jnp.float32) * unit
    wd1_pad = jnp.zeros((h_dim, 128), jnp.float32).at[:, :3].set(wd1)
    bd1_pad = jnp.zeros((1, 128), jnp.float32).at[0, :3].set(bd1)

    ws = stack(lambda c: f32(c["src_affine"]["kernel"]))   # [L, D, H]
    ws_hi = ws.astype(jnp.bfloat16)
    ws_lo = (ws - ws_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    w_src3 = jnp.concatenate([ws_hi, ws_lo, ws_hi], axis=1)

    return MegaParams(
        centers=jnp.asarray(centers),
        w_geo=w_geo, w_rbf=w_rbf,
        b0=row(params["edge_encoder_b0"]),
        w1=f32(params["edge_encoder_w1"]),
        b1=row(params["edge_encoder_b1"]),
        w2=f32(params["edge_encoder_w2"]),
        b2=row(params["edge_encoder_b2"]),
        eln_s=row(params["edge_ln_scale"]),
        eln_b=row(params["edge_ln_bias"]),
        nln_s=jnp.stack(ln_s), nln_b=jnp.stack(ln_b),
        w_src=stack(lambda c: f32(c["src_affine"]["kernel"])),
        b_src=stack(lambda c: row(c["src_affine"]["bias"])),
        w_dst=stack(lambda c: f32(c["dst_affine"]["kernel"])),
        b_dst=stack(lambda c: row(c["dst_affine"]["bias"])),
        w_e1=stack(lambda c: f32(c["edge_affine_w1"])),
        b_e1=stack(lambda c: row(c["edge_affine_b1"])),
        w_e2=stack(lambda c: f32(c["edge_affine_w2"])),
        b_e2=stack(lambda c: row(c["edge_affine_b2"])),
        w_t1=stack(lambda c: f32(c["theta_edge_w1"])),
        b_t1=stack(lambda c: row(c["theta_edge_b1"])),
        w_t2=stack(lambda c: f32(c["theta_edge_w2"])),
        b_t2=stack(lambda c: row(c["theta_edge_b2"])),
        w_pd=stack(lambda c: f32(c["phi_dst_w"])),
        b_pd=stack(lambda c: row(c["phi_dst_b"])),
        w_pe=stack(lambda c: f32(c["phi_edge_w"])),
        b_pe=stack(lambda c: row(c["phi_edge_b"])),
        w_p=stack(lambda c: f32(c["phi_w"])),
        b_p=stack(lambda c: row(c["phi_b"])),
        wd0=f32(dec["Dense_0"]["kernel"]),
        bd0=row(dec["Dense_0"]["bias"]),
        wd1=wd1_pad, bd1=bd1_pad,
        w_src3=w_src3,
    )


# ---------------------------------------------------------------------------
# Plain-XLA reference over MegaParams: the megakernel's correctness oracle,
# and the composable building blocks the distributed (halo) GNN force path
# reuses layer-by-layer (gamd_tpu.parallel.halo_gnn).
# ---------------------------------------------------------------------------

def encode_edges(mp: MegaParams, unit, std_dist, bond, mlp_act="gelu",
                 rbf_gap=0.025, exact_act=None):
    """unit [..,3], std_dist [..], bond [..] or None -> e [.., E]."""
    act = exact_act or _ACTS[mlp_act]
    gamma = 1.0 / rbf_gap
    diff = std_dist[..., None] - mp.centers[0]
    z = jnp.exp(-gamma * diff * diff) @ mp.w_rbf
    z = (z + unit[..., 0:1] * mp.w_geo[0:1] + unit[..., 1:2] * mp.w_geo[1:2]
         + unit[..., 2:3] * mp.w_geo[2:3]
         + std_dist[..., None] * mp.w_geo[3:4] + mp.b0[0])
    if bond is not None:
        z = z + bond[..., None] * mp.w_geo[4:5]
    z = act(act(z) @ mp.w1 + mp.b1[0]) @ mp.w2 + mp.b2[0]
    mean = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    return (zc * jax.lax.rsqrt(var + 1e-6)) * mp.eln_s[0] + mp.eln_b[0]


def node_norm(mp: MegaParams, layer, h, use_ln=True):
    if use_ln:
        mean = jnp.mean(h, axis=-1, keepdims=True)
        hc = h - mean
        var = jnp.mean(hc * hc, axis=-1, keepdims=True)
        h = hc * jax.lax.rsqrt(var + 1e-6)
    return h * mp.nln_s[layer, 0] + mp.nln_b[layer, 0]


def conv_apply(mp: MegaParams, layer, h_own, hn_own, hn_env, e, idx, mask,
               conv_act="silu", exact_act=None):
    """One EdgeGatedConv over a padded list whose indices point into an
    ENVIRONMENT array (hn_env ⊇ hn_own; equal for single-device)."""
    act = exact_act or _ACTS[conv_act]
    lp = lambda a: a[layer]
    src_env = hn_env @ lp(mp.w_src) + mp.b_src[layer, 0]
    dst = hn_own @ lp(mp.w_dst) + mp.b_dst[layer, 0]
    z = act(e @ lp(mp.w_e1) + mp.b_e1[layer, 0]) @ lp(mp.w_e2) \
        + mp.b_e2[layer, 0]
    z = z + src_env[idx] + dst[:, None, :]
    z = act(act(z) @ lp(mp.w_t1) + mp.b_t1[layer, 0]) @ lp(mp.w_t2) \
        + mp.b_t2[layer, 0]
    agg = jnp.sum(jnp.where(mask[..., None], hn_env[idx] * z, 0.0), axis=1)
    pre = hn_own @ lp(mp.w_pd) + mp.b_pd[layer, 0] \
        + agg @ lp(mp.w_pe) + mp.b_pe[layer, 0]
    return h_own + act(pre) @ lp(mp.w_p) + mp.b_p[layer, 0]


def decode_nodes(mp: MegaParams, h, mlp_act="gelu", exact_act=None):
    act = exact_act or _ACTS[mlp_act]
    z = act(h @ mp.wd0 + mp.bd0[0])
    return (z @ mp.wd1 + mp.bd1[0])[..., :3]


def reference_forward(pos, idx, build_mask, h0, mp: MegaParams, box, cutoff,
                      length_mean, length_std, bond=None, rbf_gap=0.025,
                      flip_dir=False, use_ln=True, conv_act="silu",
                      mlp_act="gelu", n_layers=None):
    """Single-system [N,...] XLA equivalent of mega_forward (fp32, tanh-gelu
    to match the kernel; see gamd_tpu.models.gnn.GAMDNet for erf-gelu)."""
    from gamd_tpu.core import space

    nbr = pos[idx]
    rel = space.min_image(nbr - pos[:, None, :], box)
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
    unit = rel / (dist[..., None] + 1e-8)
    if flip_dir:
        unit = -unit
    std = (dist - length_mean) / length_std
    mask = build_mask if cutoff is None else (
        build_mask & (dist * dist < cutoff * cutoff))
    e = encode_edges(mp, unit, std, bond, mlp_act, rbf_gap)
    h = h0
    n_layers = mp.w_src.shape[0] if n_layers is None else n_layers
    for layer in range(n_layers):
        hn = node_norm(mp, layer, h, use_ln)
        h = conv_apply(mp, layer, h, hn, hn, e, idx, mask, conv_act)
    return decode_nodes(mp, h, mlp_act)


def _forward_body(scalars_ref, pos_pk_ref, idx_ref, bmask_ref,
                  h0_ref, bond_ref,
                  centers_ref, w_geo_ref, w_rbf_ref, b0_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, eln_s_ref, eln_b_ref,
                  nln_s_ref, nln_b_ref, w_src_ref, b_src_ref, w_dst_ref,
                  b_dst_ref, w_e1_ref, b_e1_ref, w_e2_ref, b_e2_ref,
                  w_t1_ref, b_t1_ref, w_t2_ref, b_t2_ref,
                  w_pd_ref, b_pd_ref, w_pe_ref, b_pe_ref, w_p_ref, b_p_ref,
                  wd0_ref, bd0_ref, wd1_ref, bd1_ref, w_src3_ref,
                  out_ref,
                  e_scr, live_scr, h_scr, agg_scr, nhilo_scr,
                  dst_scr, *, row_base, atom_base,
                  tile_n: int, k: int, n_pad: int, n_tiles: int, n_rows: int,
                  n_layers: int, d: int, flip_dir: bool, use_ln: bool,
                  conv_act: str, mlp_act: str, f32_edges: bool,
                  oh_scr=None, e_lo_scr=None,
                  ablate: frozenset = frozenset(),
                  unroll_tiles: bool = False):
    """Whole-model forward over refs/scratch already in VMEM. Shared by the
    single-shot megakernel and the multi-step MD kernel.

    `ablate` (BENCHMARK-ONLY, compile-time) names stages to neutralize so
    scripts/bench_ablate.py can measure each stage's marginal wall-clock
    cost as an end-to-end delta (the honest decomposition methodology —
    in-kernel timing loops collapse on this backend, RESULTS.md). Ablated
    outputs are replaced with cheap broadcasts of the same shape; numerics
    are intentionally wrong under any non-empty ablate.

    pos_pk/out refs are 2D, already sliced to this grid step's
    replica; idx/bmask/bond/h0 are 2D with the replica axis FOLDED into
    rows (offset by row_base/atom_base) — Mosaic cannot slice the leading
    axis of a 3D ref whose lane dim is 1, but dynamic row offsets into a 2D
    ref are supported.

    pos_pk is the PACKED position table [n_pad, 128] bf16: lanes 0:3 hold
    the bf16 hi part, lanes 3:6 the residual lo part. One one-hot MXU dot
    gathers both (the f32 position is recovered with a 3-lane roll + add),
    halving the round-2 two-dot position-gather cost.

    scalars: [8] = (box, cutoff^2, length_mean, 1/length_std, rbf_gamma,
    c1, hdt) — the last two used only by the MD kernel.
    """
    rows = tile_n * k
    bf = jnp.bfloat16

    def loop_tiles(body):
        # Static unroll gives Mosaic's list scheduler independent per-tile
        # op chains to interleave (tile A's VPU activations overlap tile
        # B's MXU dots); the tiles write disjoint static scratch regions,
        # so the scheduler can prove independence. fori_loop serializes
        # iterations — measured as the MXU<->VPU dependency stalls behind
        # the theta chain's 32%-of-floor stage time (bench_ablate r3e).
        if unroll_tiles:
            for t in range(n_tiles):
                body(t, 0)
        else:
            jax.lax.fori_loop(0, n_tiles, body, 0)

    box = scalars_ref[0]
    cutoff2 = scalars_ref[1]
    length_mean = scalars_ref[2]
    inv_length_std = scalars_ref[3]
    gamma = scalars_ref[4]
    cact = _ACTS[conv_act]
    mact = _ACTS[mlp_act]
    if "acts" in ablate:            # activation (VPU transcendental) cost
        cact = mact = lambda x: x * 0.5

    def mm(a, w):
        if f32_edges:        # logic-verification mode: no bf16 noise
            return jnp.dot(a, w, preferred_element_type=jnp.float32)
        ab = a.astype(bf)
        wb = w.astype(bf)
        out = jnp.dot(ab, wb, preferred_element_type=jnp.float32)
        if e_lo_scr is not None:
            # edge_hilo (bf16x3 edge pipeline): input AND weight bf16
            # residuals ride extra dots (a_hi w_lo + a_lo w_hi; the lo x lo
            # term is ~1e-7 and dropped) — each edge matmul becomes
            # ~fp32-faithful at 3 bf16 MXU passes. Splitting only the
            # stored stream, or only the inputs, was measured insufficient
            # (tests/test_megakernel.py edge-hilo test history): the
            # weight rounding dominates the megakernel's water parity
            # envelope.
            wl = (jnp.asarray(w, jnp.float32)
                  - wb.astype(jnp.float32)).astype(bf)
            out = out + jnp.dot(ab, wl, preferred_element_type=jnp.float32)
            if a.dtype != bf:
                al = (a - ab.astype(jnp.float32)).astype(bf)
                out = out + jnp.dot(al, wb,
                                    preferred_element_type=jnp.float32)
        return out

    def mmf(a, w):
        # fp32 matmul for the node-level projections and the residual
        # stream: they are FLOP-trivial ([N, D] x [D, H]) but their error
        # compounds through `conv_layers` residual additions, so full
        # precision is nearly free accuracy (the edge pipeline, which owns
        # ~K x the FLOPs, stays bf16).
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    def _mo(v, m):
        # pl.multiple_of only wraps traced values; unrolled tiles use
        # static python ints directly.
        return v if isinstance(v, int) else pl.multiple_of(v, m)

    # ---- encoder: per tile, featurize + MLP + LN into e_scr -------------
    def enc_tile(t, _):
        r0 = _mo(t * rows, rows)                     # local (scratch) rows
        rg = _mo(row_base + t * rows, rows)          # global input rows
        a0 = _mo(t * tile_n, tile_n)
        if "gather_pos" in ablate:
            g = jnp.broadcast_to(
                pos_pk_ref[0:1, :].astype(jnp.float32), (rows, 128))
        else:
            if oh_scr is not None:
                onehot = oh_scr[pl.ds(r0, rows), :]
            else:
                idx_t = idx_ref[pl.ds(rg, rows), :]  # [rows, 1] column
                iota = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)
                onehot = (iota == idx_t).astype(bf)
            # One dot fetches hi (lanes 0:3) and lo (lanes 3:6) together;
            # the 3-lane roll+add reconstructs the exact f32 position in
            # lanes 0:3 (lanes 3+ of the sum are garbage and never read).
            g = jnp.dot(onehot, pos_pk_ref[:, :],
                        preferred_element_type=jnp.float32)
        nbr = g + pltpu.roll(g, shift=125, axis=1)
        cpk = pos_pk_ref[pl.ds(a0, tile_n), :].astype(jnp.float32)
        ctr = jnp.repeat(cpk + pltpu.roll(cpk, shift=125, axis=1),
                         k, axis=0)
        rel = nbr - ctr
        rel = rel - box * jnp.round(rel / box)
        rx, ry, rz = rel[:, 0:1], rel[:, 1:2], rel[:, 2:3]
        d2 = rx * rx + ry * ry + rz * rz
        dist = jnp.sqrt(d2)
        inv = 1.0 / (dist + 1e-8)
        sgn = -1.0 if flip_dir else 1.0
        ux, uy, uz = sgn * rx * inv, sgn * ry * inv, sgn * rz * inv
        std = (dist - length_mean) * inv_length_std

        live = jnp.where(
            (bmask_ref[pl.ds(rg, rows), :].astype(jnp.float32) > 0.5)
            & (d2 < cutoff2), 1.0, 0.0)
        live_scr[pl.ds(r0, rows), :] = live.astype(live_scr.dtype)

        if "rbf" in ablate:
            z = jnp.broadcast_to(std, (rows, w_rbf_ref.shape[1]))
        else:
            diff = std - centers_ref[0:1, :]
            rbf = jnp.exp(-gamma * diff * diff)
            z = mm(rbf, w_rbf_ref[:, :])
        z = (z + ux * w_geo_ref[0:1, :] + uy * w_geo_ref[1:2, :]
             + uz * w_geo_ref[2:3, :] + std * w_geo_ref[3:4, :]
             + bond_ref[pl.ds(rg, rows), :].astype(jnp.float32)
             * w_geo_ref[4:5, :]
             + b0_ref[0:1, :])
        if "encmlp" not in ablate:
            z = mact(z)
            z = mm(z, w1_ref[:, :]) + b1_ref[0:1, :]
            z = mact(z)
            z = mm(z, w2_ref[:, :]) + b2_ref[0:1, :]
        if "ln" not in ablate:
            mean = jnp.mean(z, axis=1, keepdims=True)
            zc = z - mean
            var = jnp.mean(zc * zc, axis=1, keepdims=True)
            z = zc * jax.lax.rsqrt(var + 1e-6)
        z = z * eln_s_ref[0:1, :] + eln_b_ref[0:1, :]
        zh = z.astype(bf)
        e_scr[pl.ds(r0, rows), :] = zh
        if e_lo_scr is not None:
            # hi/lo edge stream (GAMD_EDGE_HILO): the single-bf16 edge
            # stream was the dominant megakernel parity term (~4.7%
            # envelope -> +4 K water thermostat bias at f=25/ps,
            # results/water_rollout_perf_mk_r4h.log). The residual rides a
            # second bf16 scratch and the conv stage's first edge dot
            # splits into hi+lo partial dots — fp32-exact storage at one
            # extra [rows, E] x [E, H] bf16 dot per layer.
            e_lo_scr[pl.ds(r0, rows), :] = (z - zh.astype(jnp.float32)
                                            ).astype(bf)
        return 0

    loop_tiles(enc_tile)

    h_scr[:, :] = h0_ref[pl.ds(atom_base, n_rows), :]
    nhilo_scr[:, :] = jnp.zeros_like(nhilo_scr)

    # ---- conv layers (unrolled; weights indexed statically) --------------
    for layer in range(n_layers):
        h = h_scr[:, :]
        if use_ln and "ln" not in ablate:
            mean = jnp.mean(h, axis=1, keepdims=True)
            hc = h - mean
            var = jnp.mean(hc * hc, axis=1, keepdims=True)
            hn = hc * jax.lax.rsqrt(var + 1e-6)
        else:
            hn = h                                   # BN folded into affine
        hn = hn * nln_s_ref[layer, :, :] + nln_b_ref[layer, :, :]
        # dst staged through VMEM: conv_tile reads its tile with pl.ds —
        # Mosaic cannot dynamic_slice a register value at a loop-carried
        # offset, but ref indexing is fine.
        if "nodeops" in ablate:
            dst_scr[:, :] = hn.astype(dst_scr.dtype)
        else:
            dst_scr[:, :] = (mmf(hn, w_dst_ref[layer])
                             + b_dst_ref[layer, :, :]).astype(dst_scr.dtype)
        # Only hn is gathered per edge; src_affine is applied AFTER the
        # gather ([rows,D]@[D,H] = 0.4 GF vs gathering a precomputed
        # 256-lane concat = 1.3 GF extra). The hi/lo bf16 split keeps the
        # gather fp32-exact — a single bf16 copy was measured at 1.4% mean
        # force error, above the 0.6% relative-MAE accuracy budget. hi and
        # lo live side by side in one [n_pad, 2D] table so the gather is a
        # single K=n_pad dot (same FLOPs as two D-wide dots, half the ops).
        nhi = hn.astype(bf)
        nhilo_scr[0:n_rows, 0:d] = nhi
        nhilo_scr[0:n_rows, d:2 * d] = (hn - nhi.astype(jnp.float32)
                                        ).astype(bf)

        def conv_tile(t, _):
            r0 = _mo(t * rows, rows)
            rg = _mo(row_base + t * rows, rows)
            a0 = _mo(t * tile_n, tile_n)
            if "gather_conv" in ablate:
                g2 = jnp.broadcast_to(
                    nhilo_scr[0:1, :].astype(jnp.float32), (rows, 2 * d))
            else:
                if oh_scr is not None:
                    onehot = oh_scr[pl.ds(r0, rows), :]
                else:
                    idx_t = idx_ref[pl.ds(rg, rows), :]  # [rows, 1] column
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, n_pad), 1)
                    onehot = (iota == idx_t).astype(bf)
                g2 = jnp.dot(onehot, nhilo_scr[:, :],
                             preferred_element_type=jnp.float32)
            ghi = g2[:, 0:d]
            glo = g2[:, d:2 * d]
            h_src = ghi + glo
            # src_affine applied post-gather. ghi/glo are exactly
            # bf16-representable (one-hot selections of bf16 rows), and the
            # weight is split hi/lo too (lo x lo term ~1e-5, dropped), so
            # src_code matches the fp32 node-level affine the XLA oracle
            # computes — a single bf16 rounding here measured 3.5% max
            # force error, over the 3% parity budget. The three partial
            # dots run as ONE K=3D dot against the prepacked
            # [ws_hi; ws_lo; ws_hi] stack.
            if "srcaff" in ablate:
                src_code = jnp.broadcast_to(
                    b_src_ref[layer, :, :], (rows, b_src_ref.shape[2]))
            else:
                gcat = jnp.concatenate(
                    [ghi.astype(bf), glo.astype(bf)], axis=1)
                gcat = jnp.concatenate([ghi.astype(bf), gcat], axis=1)
                src_code = (jnp.dot(gcat, w_src3_ref[layer],
                                    preferred_element_type=jnp.float32)
                            + b_src_ref[layer, :, :])
            if e_lo_scr is None:
                x = e_scr[pl.ds(r0, rows), :].astype(jnp.float32)
                z1 = None
            else:
                xhi = e_scr[pl.ds(r0, rows), :]
                xlo = e_lo_scr[pl.ds(r0, rows), :]
                x = xhi.astype(jnp.float32) + xlo.astype(jnp.float32)
                z1 = mm(xhi, w_e1_ref[layer]) + mm(xlo, w_e1_ref[layer])
            if "emlp" in ablate:
                z = x
            else:
                if z1 is None:
                    z1 = mm(x, w_e1_ref[layer])
                z = cact(z1 + b_e1_ref[layer, :, :])
                z = mm(z, w_e2_ref[layer]) + b_e2_ref[layer, :, :]
            dst_t = dst_scr[pl.ds(a0, tile_n), :].astype(jnp.float32)
            if "repeat" in ablate:
                z = z + src_code + dst_t[0:1, :]
            else:
                z = z + src_code + jnp.repeat(dst_t, k, axis=0)
            if "theta" not in ablate:
                z = cact(mm(cact(z), w_t1_ref[layer])
                         + b_t1_ref[layer, :, :])
                z = mm(z, w_t2_ref[layer]) + b_t2_ref[layer, :, :]
            msg = (z * h_src) * live_scr[pl.ds(r0, rows),
                                         :].astype(jnp.float32)
            if "agg" in ablate:
                agg_scr[pl.ds(a0, tile_n), :] = msg[0:tile_n, :]
            else:
                agg_scr[pl.ds(a0, tile_n), :] = jnp.sum(
                    msg.reshape(tile_n, k, d), axis=1)
            return 0

        loop_tiles(conv_tile)
        agg = agg_scr[:, :]
        if "nodeops" in ablate:
            h_scr[:, :] = h + cact(hn + agg)
        else:
            pre = (mmf(hn, w_pd_ref[layer]) + b_pd_ref[layer, :, :]
                   + mmf(agg, w_pe_ref[layer]) + b_pe_ref[layer, :, :])
            h_scr[:, :] = h + mmf(cact(pre), w_p_ref[layer]) \
                + b_p_ref[layer, :, :]

    # ---- decoder ---------------------------------------------------------
    h = h_scr[:, :]
    if "decoder" in ablate:
        out_ref[:, :] = h
    else:
        z = mact(mmf(h, wd0_ref[:, :]) + bd0_ref[0:1, :])
        out_ref[:, :] = mmf(z, wd1_ref[:, :]) + bd1_ref[0:1, :]


#: Enable the per-program one-hot cache when the [rows_total, n_pad] bf16
#: table fits comfortably inside scoped VMEM. The one-hot gather matrices
#: depend only on the (fixed) neighbor list, so building them once per
#: program replaces n_tiles x (1 + n_layers) [x n_steps in the MD kernel]
#: iota-compare rebuilds with VMEM reads.
_OH_CACHE_BYTES = 24 * 2**20

#: Static tile-loop unroll (see _forward_body.loop_tiles): DEFAULT ON for
#: small tile counts since the round-4 on-chip A/B (+6%: 4,859 vs 4,578
#: steps/s at tile 136, results/bench_unroll_r4.log) and the unrolled
#: parity pass (results/check_kernels_r4b.log, GAMD_UNROLL_TILES=1).
#: Independent per-tile dependency chains let Mosaic's list scheduler
#: overlap one tile's VPU activations with another's MXU dots — the theta
#: chain runs at 32% of its FLOP floor precisely because of that serial
#: MXU->VPU->MXU dependency (results/bench_ablate_r3e.log). Never unrolls
#: past _UNROLL_TILES_MAX tiles (compile size). GAMD_UNROLL_TILES=0
#: disables.
_UNROLL_TILES_MAX = 4


def _resolve_unroll(n_tiles: int) -> bool:
    import os
    env = os.environ.get("GAMD_UNROLL_TILES")
    if env is not None and env != "":
        return env not in ("0", "off", "false") and n_tiles <= _UNROLL_TILES_MAX
    return n_tiles <= _UNROLL_TILES_MAX


#: Cap on the hi/lo residual scratch ([rows_total, e_dim] bf16). The water
#: deployment shape (N=774: rows 75264, e_dim 128 -> 19.3 MB residual)
#: pushes the per-step megakernel to 137.44 MB scoped VMEM, past both the
#: 126 MB limit and the v5e's capacity (measured compile failure,
#: results/water_rollout_mk_hilo_r5d.log) — the dominant co-resident cost
#: is the [rows, 1] idx/mask/bond columns, which Mosaic lane-pads 128x
#: (s32[75264,1] -> 36.75 MB). Until those ride lane-packed, hilo
#: auto-disables past this size; a k_model=64 slice (rows 57344,
#: residual 14.7 MB) fits and is the supported water-hilo deployment.
_EDGE_HILO_MAX_BYTES = 15 * 2**20


def _resolve_edge_hilo(default, rows_total=None, e_dim=None) -> bool:
    """hi/lo (fp32-exact) edge-stream storage — see _forward_body. Default
    comes from the caller (GNNForceField turns it on for water deployment);
    GAMD_EDGE_HILO=0/1 overrides for A/Bs. Shapes whose lo-residual scratch
    exceeds _EDGE_HILO_MAX_BYTES fall back to the single-bf16 stream (with
    a warning) instead of failing VMEM assignment at compile time."""
    import os
    env = os.environ.get("GAMD_EDGE_HILO")
    if env is not None and env != "":
        on = env not in ("0", "off", "false")
    else:
        on = bool(default)
    if on and rows_total is not None and e_dim is not None \
            and rows_total * e_dim * 2 > _EDGE_HILO_MAX_BYTES:
        import warnings
        warnings.warn(
            f"edge_hilo disabled: lo-residual scratch {rows_total}x{e_dim} "
            f"bf16 = {rows_total * e_dim * 2 / 2**20:.1f} MB exceeds the "
            f"{_EDGE_HILO_MAX_BYTES / 2**20:.0f} MB VMEM cap; the edge "
            "stream runs single-bf16 (wider parity envelope). Reduce the "
            "neighbor slice (k_model<=64 at N=774) to re-enable.")
        on = False
    return on


def _fill_onehot(oh_scr, idx_ref, row_base, n_tiles, rows, n_pad):
    """Build the per-tile one-hot gather matrices into VMEM once."""

    def tile(t, _):
        r0 = pl.multiple_of(t * rows, rows)
        rg = pl.multiple_of(row_base + t * rows, rows)
        idx_t = idx_ref[pl.ds(rg, rows), :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)
        oh_scr[pl.ds(r0, rows), :] = (iota == idx_t).astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


@trace_at_default_matmul_precision
def _mega_kernel(scalars_ref, pos_pk_ref, idx_ref, bmask_ref,
                 h0_ref, bond_ref, *rest,
                 tile_n: int, k: int, n_pad: int, n_tiles: int, n_rows: int,
                 n_layers: int, d: int, flip_dir: bool, use_ln: bool,
                 conv_act: str, mlp_act: str, f32_edges: bool,
                 cache_onehot: bool, edge_hilo: bool = False,
                 unroll_tiles: bool = False):
    """Single forward pass (grid = replicas). See _forward_body."""
    n_scr = 6 + int(cache_onehot) + int(edge_hilo)
    weights = rest[:-(1 + n_scr)]
    out_ref = rest[-(1 + n_scr)]
    scratch = rest[-n_scr:]
    oh_scr = scratch[6] if cache_onehot else None
    e_lo_scr = scratch[6 + int(cache_onehot)] if edge_hilo else None
    p = pl.program_id(0)
    rows_total = n_tiles * tile_n * k
    if cache_onehot:
        _fill_onehot(oh_scr, idx_ref, p * rows_total, n_tiles,
                     tile_n * k, n_pad)
    _forward_body(
        scalars_ref, pos_pk_ref.at[p], idx_ref, bmask_ref,
        h0_ref, bond_ref, *weights, out_ref.at[p], *scratch[:6],
        row_base=p * rows_total, atom_base=p * n_rows,
        tile_n=tile_n, k=k, n_pad=n_pad, n_tiles=n_tiles, n_rows=n_rows,
        n_layers=n_layers, d=d, flip_dir=flip_dir, use_ln=use_ln,
        conv_act=conv_act, mlp_act=mlp_act, f32_edges=f32_edges,
        oh_scr=oh_scr, e_lo_scr=e_lo_scr, unroll_tiles=unroll_tiles)


@trace_at_default_matmul_precision
def _mega_md_kernel(scalars_ref, seeds_ref, pos0_ref, vel0_ref, f0_ref,
                    idx_ref, bmask_ref, h0_ref, bond_ref, invm_ref, c2_ref,
                    m_ref, *rest,
                    n_steps: int, tile_n: int, k: int, n_pad: int,
                    n_tiles: int, n_rows: int, n_layers: int, d: int,
                    flip_dir: bool, use_ln: bool, conv_act: str,
                    mlp_act: str, f32_edges: bool, interpret_rng: bool,
                    cache_onehot: bool, edge_hilo: bool = False,
                    ablate: frozenset = frozenset(),
                    unroll_tiles: bool = False):
    """n_steps of BAOAB Langevin MD with the GNN forward run ENTIRELY in
    one kernel invocation: positions, velocities, and the edge stream stay
    VMEM-resident across the whole neighbor-reuse window, and thermostat
    noise comes from the on-core PRNG — no per-step launch, no per-step HBM
    traffic beyond weight reads.

    Semantics match gamd_tpu.md.integrators.baoab_langevin step_fn exactly
    (B A O A [force] B with c1 = exp(-gamma dt), c2 = sigma sqrt(1-c1^2));
    only the gaussian stream differs (on-core PRNG + Box-Muller instead of
    threefry). Reference for the split the fused step replaces:
    /root/reference/code/hack_integrator.py:141-178.
    """
    n_scr = 10 + int(cache_onehot) + int(edge_hilo)
    weights = rest[:-(4 + n_scr)]
    pos_out, vel_out, f_out, thermo_out = rest[-(4 + n_scr):-n_scr]
    scratch = rest[-n_scr:]
    (e_scr, live_scr, h_scr, agg_scr, nhilo_scr, dst_scr,
     pcur_scr, vcur_scr, f_scr, ppk_scr) = scratch[:10]
    oh_scr = scratch[10] if cache_onehot else None
    e_lo_scr = scratch[10 + int(cache_onehot)] if edge_hilo else None

    p = pl.program_id(0)
    rows_total = n_tiles * tile_n * k
    if cache_onehot:
        _fill_onehot(oh_scr, idx_ref, p * rows_total, n_tiles,
                     tile_n * k, n_pad)
    if not interpret_rng:
        pltpu.prng_seed(seeds_ref[0], p)
    pcur_scr[:, :] = pos0_ref.at[p][:, :]
    vcur_scr[:, :] = vel0_ref.at[p][:, :]
    f_scr[:, :] = f0_ref.at[p][:, :]
    c1 = scalars_ref[5]
    hdt = scalars_ref[6]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
    lmask = (lane < 3).astype(jnp.float32)
    invm = invm_ref[:, :]
    c2 = c2_ref[:, :]
    mcol = m_ref[:, :]

    def refresh_hilo():
        # Packed hi/lo table: lanes 0:3 = bf16(pos), lanes 3:6 = residual.
        # pcur lanes 3+ are zero, so the two bf16 fields have disjoint
        # support and the add is exact. The roll runs in f32 (Mosaic's
        # tpu.dynamic_rotate only supports 32-bit data); the post-roll
        # bf16 cast equals casting before the roll, so numerics match the
        # old two-table scheme exactly.
        pc = pcur_scr[:, :]
        phi = pc.astype(jnp.bfloat16)
        plo = pc - phi.astype(jnp.float32)
        ppk_scr[:, :] = phi + pltpu.roll(plo, shift=3, axis=1
                                         ).astype(jnp.bfloat16)

    def fwd():
        _forward_body(
            scalars_ref, ppk_scr, idx_ref, bmask_ref, h0_ref,
            bond_ref, *weights, f_scr,
            e_scr, live_scr, h_scr, agg_scr, nhilo_scr, dst_scr,
            row_base=p * rows_total, atom_base=p * n_rows,
            tile_n=tile_n, k=k, n_pad=n_pad, n_tiles=n_tiles, n_rows=n_rows,
            n_layers=n_layers, d=d, flip_dir=flip_dir, use_ln=use_ln,
            conv_act=conv_act, mlp_act=mlp_act, f32_edges=f32_edges,
            oh_scr=oh_scr, e_lo_scr=e_lo_scr, ablate=ablate,
            unroll_tiles=unroll_tiles)

    def hash_bits(s, tag):
        # interpret-mode stand-in for the on-core PRNG (which has no CPU
        # lowering): murmur3-finalizer hash of (seed, replica, step, draw,
        # element) — test-quality randomness only.
        c = (seeds_ref[0].astype(jnp.uint32) * jnp.uint32(2654435761)
             + jnp.uint32(p * 40503 + s * 69069 + tag * 97))
        v = (jax.lax.broadcasted_iota(jnp.uint32, (n_rows, 128), 0)
             * jnp.uint32(128)
             + jax.lax.broadcasted_iota(jnp.uint32, (n_rows, 128), 1)
             + c * jnp.uint32(0x9E3779B9))
        v = v ^ (v >> 16)
        v = v * jnp.uint32(0x85EBCA6B)
        v = v ^ (v >> 13)
        v = v * jnp.uint32(0xC2B2AE35)
        return v ^ (v >> 16)

    def gaussian(s):
        if "noise" in ablate:       # PRNG + Box-Muller (VPU) cost
            return jnp.zeros((n_rows, 128), jnp.float32)
        if interpret_rng:
            bits1 = jax.lax.bitcast_convert_type(hash_bits(s, 0), jnp.int32)
            bits2 = jax.lax.bitcast_convert_type(hash_bits(s, 1), jnp.int32)
        else:
            bits1 = pltpu.prng_random_bits((n_rows, 128))
            bits2 = pltpu.prng_random_bits((n_rows, 128))
        # int32 throughout (Mosaic has no uint32->f32 cast): arithmetic
        # shift then mask to 23 bits, guaranteeing a non-negative mantissa.
        m23 = jnp.int32(0x7FFFFF)
        u1 = ((bits1 >> 9) & m23).astype(jnp.float32) \
            * (1.0 / (1 << 23)) + 1e-7
        u2 = ((bits2 >> 9) & m23).astype(jnp.float32) * (1.0 / (1 << 23))
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
            np.float32(2.0 * np.pi) * u2)

    def step(s, _):
        v = vcur_scr[:, :] + hdt * invm * f_scr[:, :]            # B
        x = pcur_scr[pl.ds(0, n_rows), :] + hdt * v              # A
        v = c1 * v + c2 * (gaussian(s) * lmask)                  # O
        x = x + hdt * v                                          # A
        pcur_scr[pl.ds(0, n_rows), :] = x
        refresh_hilo()
        fwd()                                                    # f(x_new)
        v = v + hdt * invm * f_scr[:, :]                         # B
        vcur_scr[:, :] = v
        ke = 0.5 * jnp.sum(mcol * v * v)
        thermo_out[p * n_steps + s] = ke
        return 0

    refresh_hilo()     # pos lanes 3+ are zero; rows >= n_rows never move
    jax.lax.fori_loop(0, n_steps, step, 0)
    pos_out.at[p][:, :] = pcur_scr[:, :]
    vel_out.at[p][:, :] = vcur_scr[:, :]
    f_out.at[p][:, :] = f_scr[:, :]


def mega_md_steps(pos, vel, force, idx, build_mask, h0, mp: MegaParams,
                  box, cutoff, length_mean, length_std, masses, *,
                  n_steps: int, c1, hdt, c2col, seed, bond=None,
                  rbf_gap=0.025, flip_dir=False, use_ln=True,
                  conv_act="silu", mlp_act="gelu", tile_n: int = 16,
                  interpret: bool = False, f32_edges: bool = False,
                  edge_hilo: bool = False, ablate=()):
    """Advance n_steps of fused BAOAB GNN-MD in ONE device program.

    Args:
        pos/vel/force: [N,3] or [R,N,3] current state (forces in the units
            folded into mp — internal MD units for the Simulation driver).
        idx/build_mask/bond: padded neighbor data, fixed for the window.
        h0: initial node features (constant per system).
        masses: [N] atomic masses (internal units); padding handled here.
        c1: exp(-gamma dt); hdt: dt/2; c2col: [N] sigma*sqrt(1-c1^2)
            (thermostat constants, precomputed by the caller in internal
            units to match integrators.baoab_langevin).
        seed: int32 scalar (traced ok) seeding the on-core PRNG; replica p
            reseeds with (seed, p).

    Returns (pos', vel', force', ke) with ke [n_steps] (or [R, n_steps])
    in kJ/mol.
    """
    squeeze = pos.ndim == 2
    if squeeze:
        pos, vel, force = pos[None], vel[None], force[None]
        idx, build_mask = idx[None], build_mask[None]
        h0 = h0[None]
        bond = None if bond is None else bond[None]
    r, n, _ = pos.shape
    k = idx.shape[2]
    d = h0.shape[2]
    h_dim = mp.w1.shape[0]
    e_dim = mp.w2.shape[1]
    n_rows_t = _round_up(n, tile_n)
    n_pad = _round_up(n, 128)
    n_tiles = n_rows_t // tile_n
    rows_total = n_rows_t * k

    if n_rows_t != n:
        pad = n_rows_t - n
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        build_mask = jnp.pad(build_mask, ((0, 0), (0, pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, 0), (0, pad), (0, 0)))
        if bond is not None:
            bond = jnp.pad(bond, ((0, 0), (0, pad), (0, 0)))

    def cols(x, rows):
        out = jnp.zeros((r, rows, 128), jnp.float32)
        return out.at[:, :n, :3].set(x.astype(jnp.float32))

    pos_cols = cols(pos, n_pad)
    vel_cols = cols(vel, n_rows_t)
    f_cols = cols(force, n_rows_t)

    col = lambda v: jnp.zeros((n_rows_t, 1), jnp.float32).at[:n, 0].set(
        jnp.asarray(v, jnp.float32))
    m_arr = jnp.asarray(masses, jnp.float32)
    invm_col = col(1.0 / m_arr)
    c2_col = col(c2col)
    m_col = col(m_arr)

    bmask = build_mask.astype(jnp.bfloat16).reshape(r * rows_total, 1)
    if bond is None:
        bond_in = jnp.zeros((r * rows_total, 1), jnp.bfloat16)
    else:
        bond_in = bond.astype(jnp.bfloat16).reshape(r * rows_total, 1)

    cutoff2 = (jnp.asarray(cutoff, jnp.float32) ** 2 if cutoff is not None
               else jnp.asarray(jnp.inf, jnp.float32))
    scalars = jnp.stack([
        jnp.asarray(box, jnp.float32), cutoff2,
        jnp.asarray(length_mean, jnp.float32),
        1.0 / jnp.asarray(length_std, jnp.float32),
        jnp.asarray(1.0 / rbf_gap, jnp.float32),
        jnp.asarray(c1, jnp.float32), jnp.asarray(hdt, jnp.float32),
        jnp.zeros(()),
    ])
    seeds = jnp.asarray(seed, jnp.int32).reshape(1)

    cache_onehot = rows_total * n_pad * 2 <= _OH_CACHE_BYTES
    edge_hilo = _resolve_edge_hilo(edge_hilo, rows_total, e_dim)
    kernel = functools.partial(
        _mega_md_kernel, n_steps=n_steps, tile_n=tile_n, k=k, n_pad=n_pad,
        n_tiles=n_tiles, n_rows=n_rows_t, n_layers=mp.w_src.shape[0], d=d,
        flip_dir=flip_dir, use_ln=use_ln, conv_act=conv_act,
        mlp_act=mlp_act, f32_edges=f32_edges, interpret_rng=interpret,
        cache_onehot=cache_onehot, edge_hilo=edge_hilo,
        ablate=frozenset(ablate),
        unroll_tiles=_resolve_unroll(n_tiles))

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r,),
        in_specs=[full()] * (10 + len(MegaParams._fields)),
        out_specs=[full(), full(), full(),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((rows_total, e_dim), jnp.bfloat16),   # e
            pltpu.VMEM((rows_total, 1), jnp.bfloat16),       # live mask
            pltpu.VMEM((n_rows_t, d), jnp.float32),          # h
            pltpu.VMEM((n_rows_t, d), jnp.float32),          # agg
            pltpu.VMEM((n_pad, 2 * d), jnp.bfloat16),        # hn hi|lo
            pltpu.VMEM((n_rows_t, h_dim), jnp.float32),      # dst stage
            pltpu.VMEM((n_pad, 128), jnp.float32),           # pos current
            pltpu.VMEM((n_rows_t, 128), jnp.float32),        # vel current
            pltpu.VMEM((n_rows_t, 128), jnp.float32),        # force
            pltpu.VMEM((n_pad, 128), jnp.bfloat16),          # pos packed
        ] + ([pltpu.VMEM((rows_total, n_pad), jnp.bfloat16)]  # onehot cache
             if cache_onehot else [])
          + ([pltpu.VMEM((rows_total, e_dim), jnp.bfloat16)]  # e lo residual
             if edge_hilo else []),
    )

    pos_o, vel_o, f_o, ke = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r, n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((r, n_rows_t, 128), jnp.float32),
            jax.ShapeDtypeStruct((r, n_rows_t, 128), jnp.float32),
            jax.ShapeDtypeStruct((r * n_steps,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 2**20),
        interpret=interpret,
    )(scalars, seeds, pos_cols, vel_cols, f_cols,
      idx.astype(jnp.int32).reshape(r * rows_total, 1), bmask,
      h0.reshape(r * n_rows_t, d), bond_in, invm_col, c2_col, m_col, *mp)

    pos_n = pos_o[:, :n, :3]
    vel_n = vel_o[:, :n, :3]
    f_n = f_o[:, :n, :3]
    ke = ke.reshape(r, n_steps)
    if squeeze:
        return pos_n[0], vel_n[0], f_n[0], ke[0]
    return pos_n, vel_n, f_n, ke


def mega_forward(pos, idx, build_mask, h0, mp: MegaParams, box, cutoff,
                 length_mean, length_std, bond=None, rbf_gap=0.025,
                 flip_dir=False, use_ln=True, conv_act="silu",
                 mlp_act="gelu", tile_n: int = 16, interpret: bool = False,
                 f32_edges: bool = False, edge_hilo: bool = False):
    """Run the whole force model in one device program.

    Args:
        pos:  [N, 3] or [R, N, 3] wrapped positions (R = replicas; each
              replica is one grid step — the explicit batch dimension).
        idx:  [N, K] / [R, N, K] padded neighbor ids (build-time lists).
        build_mask: [N, K] / [R, N, K] bool validity at build time; the
              kernel intersects it with the true-cutoff test from current
              positions (set cutoff=None to pass it through unchanged).
        h0:   [N, D] / [R, N, D] initial node features (LJ: broadcast
              embedding row; water: node_encoder(one-hot) — constant per
              system, precomputed).
        bond: optional [N, K] / [R, N, K] bond channel.
        mp:   MegaParams from pack_params.

    Returns [N, 3] (or [R, N, 3]) forces in the units folded into mp.
    """
    squeeze = pos.ndim == 2
    if squeeze:
        pos, idx, build_mask, h0 = (pos[None], idx[None], build_mask[None],
                                    h0[None])
        bond = None if bond is None else bond[None]
    r, n, _ = pos.shape
    k = idx.shape[2]
    d = h0.shape[2]
    h_dim = mp.w1.shape[0]
    e_dim = mp.w2.shape[1]
    n_rows_t = _round_up(n, tile_n)
    n_pad = _round_up(n, 128)
    n_tiles = n_rows_t // tile_n
    rows_total = n_rows_t * k

    if n_rows_t != n:
        pad = n_rows_t - n
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        build_mask = jnp.pad(build_mask, ((0, 0), (0, pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, 0), (0, pad), (0, 0)))
        if bond is not None:
            bond = jnp.pad(bond, ((0, 0), (0, pad), (0, 0)))

    pos_f = pos.astype(jnp.float32)
    hi = pos_f.astype(jnp.bfloat16)
    lo = (pos_f - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    pos_pk = (jnp.zeros((r, n_pad, 128), jnp.bfloat16)
              .at[:, :n, 0:3].set(hi).at[:, :n, 3:6].set(lo))

    # Replica axis folded into rows (2D column layout) — see _mega_kernel.
    # bf16 carries 0/1 flags exactly and halves the VMEM footprint (the
    # whole program must fit the ~16 MB scoped VMEM budget).
    bmask = build_mask.astype(jnp.bfloat16).reshape(r * rows_total, 1)
    if bond is None:
        bond_in = jnp.zeros((r * rows_total, 1), jnp.bfloat16)
    else:
        bond_in = bond.astype(jnp.bfloat16).reshape(r * rows_total, 1)

    cutoff2 = (jnp.asarray(cutoff, jnp.float32) ** 2 if cutoff is not None
               else jnp.asarray(jnp.inf, jnp.float32))
    scalars = jnp.stack([
        jnp.asarray(box, jnp.float32), cutoff2,
        jnp.asarray(length_mean, jnp.float32),
        1.0 / jnp.asarray(length_std, jnp.float32),
        jnp.asarray(1.0 / rbf_gap, jnp.float32),
        jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
    ])

    cache_onehot = rows_total * n_pad * 2 <= _OH_CACHE_BYTES
    edge_hilo = _resolve_edge_hilo(edge_hilo, rows_total, e_dim)
    kernel = functools.partial(
        _mega_kernel, tile_n=tile_n, k=k, n_pad=n_pad, n_tiles=n_tiles,
        n_rows=n_rows_t, n_layers=mp.w_src.shape[0], d=d, flip_dir=flip_dir,
        use_ln=use_ln, conv_act=conv_act, mlp_act=mlp_act,
        f32_edges=f32_edges, cache_onehot=cache_onehot,
        edge_hilo=edge_hilo,
        unroll_tiles=_resolve_unroll(n_tiles))

    # All tensor refs ride into VMEM whole (with their replica axis); the
    # kernel wrapper slices the current grid step's replica with a dynamic
    # leading-dim index. Mosaic forbids BlockSpec blocks whose trailing dim
    # is not 128-aligned (idx/mask/bond are [rows, 1] columns), but dynamic
    # indexing of a ref's untiled leading axis is fine.
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[full()] * (5 + len(MegaParams._fields)),
        out_specs=full(),
        scratch_shapes=[
            pltpu.VMEM((rows_total, e_dim), jnp.bfloat16),   # e
            pltpu.VMEM((rows_total, 1), jnp.bfloat16),       # live mask
            pltpu.VMEM((n_rows_t, d), jnp.float32),          # h
            pltpu.VMEM((n_rows_t, d), jnp.float32),          # agg
            pltpu.VMEM((n_pad, 2 * d), jnp.bfloat16),        # hn hi|lo
            pltpu.VMEM((n_rows_t, h_dim), jnp.float32),      # dst stage
        ] + ([pltpu.VMEM((rows_total, n_pad), jnp.bfloat16)]  # onehot cache
             if cache_onehot else [])
          + ([pltpu.VMEM((rows_total, e_dim), jnp.bfloat16)]  # e lo residual
             if edge_hilo else []),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, n_rows_t, 128), jnp.float32),
        # Some shapes (bench_mxu's full-forward at K=64) spill ~1 MB past
        # Mosaic's default 16 MB scoped-VMEM stack cap; the v5e has 128 MB
        # of VMEM, so raise the scoped limit well clear of it. 126 MB: the
        # 8-replica NHC forward at tile_n=136 needs 118.52 MB when nested
        # in the NHC while-loop (r4 replica bench compile failure at 112).
        # Only this call is raised — the megastep kernel stays at its
        # validated 112 MB so headline-bench buffer assignment is unchanged.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=126 * 2**20),
        interpret=interpret,
    )(scalars, pos_pk,
      idx.astype(jnp.int32).reshape(r * rows_total, 1), bmask,
      h0.reshape(r * n_rows_t, d), bond_in,
      *mp)
    forces = out[:, :n, :3]
    return forces[0] if squeeze else forces
