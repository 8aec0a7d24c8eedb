#!/usr/bin/env python
"""Bisection microbenchmark INSIDE the megastep kernel: which stage owns
the gap between the measured 255 us/step and the ~117 us FLOP floor?

A device trace cannot decompose the megastep (it is ONE pallas_call), so
this times standalone Pallas kernels that each run `iters` repetitions of
one stage of ops/pallas_model._forward_body at the production LJ-258
shapes (tile_n=16, k_model=48, D=E=H=128, 4 conv layers + encoder):

  peak        dense bf16 [512,512]@[512,512] chain — the chip's real peak
  gather_mm   the one-hot gather matmuls with the one-hot PREBUILT
  gather_full iota+compare one-hot build + hi/lo gather + src hi/lo affine
  edge_mlp    the per-tile edge-MLP chain (e1/e2/t1/t2 matmuls + acts)
  repeat      the jnp.repeat(dst_tile, k) lane-broadcast relayout
  encoder     full enc_tile body (featurize + RBF + MLP + LN)
  conv        full conv_tile body
  forward     whole _forward_body (all tiles, all layers)

Every kernel loops `iters` times over the same VMEM-resident data, so
per-call launch cost (~20-30 us) amortizes away and the number is the
steady-state per-iteration cost. FLOP counts are printed so achieved
TFLOP/s can be read against the ~197 bf16 TFLOP/s v5e peak.

Each loop body mixes `o_ref[0:1] * 1e-30` back into one of its inputs:
without that loop-carried dependence Mosaic hoists the loop-invariant
body out of the fori_loop and the bench times ONE iteration divided by
`iters` (first run of this script printed 5,167 "TFLOP/s" for the peak
stage — 26x the chip's actual peak).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, args, iters, label, flops_per_iter, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    us = best / iters * 1e6
    tf = flops_per_iter / (best / iters) / 1e12 if flops_per_iter else 0.0
    print(f"{label:14s} {us:9.2f} us/iter   {tf:7.1f} TFLOP/s")
    return us


def loop_kernel(body, n_out=1):
    """Wrap `body(refs...) -> stores into out` in an iters-loop kernel."""
    def kernel(*refs, iters):
        def it(i, _):
            body(i, *refs)
            return 0
        jax.lax.fori_loop(0, iters, it, 0)
    return kernel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--tile_n", type=int, default=16)
    p.add_argument("--k", type=int, default=48)
    p.add_argument("--n", type=int, default=258)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    interp = args.cpu

    tile_n, k = args.tile_n, args.k
    rows = tile_n * k
    n_pad = -(-args.n // 128) * 128
    n_rows = -(-args.n // tile_n) * tile_n
    n_tiles = n_rows // tile_n
    D = 128
    bf = jnp.bfloat16
    rng = np.random.RandomState(0)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(body, inputs, out_shape, label, flops, scratch=()):
        kern = functools.partial(loop_kernel(body), iters=args.iters)
        f = pl.pallas_call(
            kern,
            in_specs=[full()] * len(inputs),
            out_specs=full(),
            out_shape=out_shape,
            scratch_shapes=list(scratch),
            interpret=interp,
        )
        jf = jax.jit(f)
        return timed(jf, inputs, args.iters, label, flops)

    # ---- peak: dense bf16 matmul chain ------------------------------------
    a = jnp.asarray(rng.randn(512, 512), bf)
    w = jnp.asarray(rng.randn(512, 512), bf)

    def peak_body(i, a_ref, w_ref, o_ref):
        x = a_ref[:, :] + (o_ref[0:1, :] * 1e-30).astype(bf)
        for _ in range(4):
            x = jnp.dot(x, w_ref[:, :],
                        preferred_element_type=jnp.float32).astype(bf)
        o_ref[:, :] = x.astype(jnp.float32)

    run(peak_body, (a, w), jax.ShapeDtypeStruct((512, 512), jnp.float32),
        "peak", 4 * 2 * 512**3)

    # ---- gather_mm: prebuilt one-hot x hi/lo node matrices ----------------
    onehot = jnp.asarray(
        (rng.randint(0, n_pad, (rows, 1)) ==
         np.arange(n_pad)[None, :]), bf)
    nh = jnp.asarray(rng.randn(n_pad, D), bf)
    nl = jnp.asarray(rng.randn(n_pad, D) * 1e-3, bf)

    def gmm_body(i, oh_ref, nh_ref, nl_ref, o_ref):
        nh_eff = nh_ref[:, :] + (o_ref[0:1, :] * 1e-30).astype(bf)
        ghi = jnp.dot(oh_ref[:, :], nh_eff,
                      preferred_element_type=jnp.float32)
        glo = jnp.dot(oh_ref[:, :], nl_ref[:, :],
                      preferred_element_type=jnp.float32)
        o_ref[:, :] = ghi + glo

    run(gmm_body, (onehot, nh, nl),
        jax.ShapeDtypeStruct((rows, D), jnp.float32),
        "gather_mm", 2 * 2 * rows * n_pad * D)

    # ---- gather_mm_8M: same contraction at 8x the M dim ---------------------
    # If per-row cost drops ~8x here, the MXU idles at M=rows and folding
    # replicas into the matmul M dimension recovers it (the round-2
    # replica-aggregate-flat result came from replicas running as
    # SEQUENTIAL grid iterations, not from saturation).
    rows8 = 8 * rows
    onehot8 = jnp.asarray(
        (rng.randint(0, n_pad, (rows8, 1)) ==
         np.arange(n_pad)[None, :]), bf)
    run(gmm_body, (onehot8, nh, nl),
        jax.ShapeDtypeStruct((rows8, D), jnp.float32),
        "gather_mm_8M", 2 * 2 * rows8 * n_pad * D)

    # ---- gather_full: iota build + gathers + src hi/lo affine -------------
    idx_col = jnp.asarray(rng.randint(0, args.n, (rows, 1)), jnp.int32)
    ws = jnp.asarray(rng.randn(D, D), jnp.float32)

    def gfull_body(i, idx_ref, nh_ref, nl_ref, ws_ref, o_ref):
        # idx depends on the carry so the one-hot build re-executes per iter.
        idx_eff = idx_ref[:, :] + (o_ref[0, 0] * 1e-30).astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)
        oh = (iota == idx_eff).astype(bf)
        ghi = jnp.dot(oh, nh_ref[:, :], preferred_element_type=jnp.float32)
        glo = jnp.dot(oh, nl_ref[:, :], preferred_element_type=jnp.float32)
        wsv = ws_ref[:, :]
        ws_hi = wsv.astype(bf)
        ws_lo = (wsv - ws_hi.astype(jnp.float32)).astype(bf)
        src = (jnp.dot(ghi.astype(bf), ws_hi,
                       preferred_element_type=jnp.float32)
               + jnp.dot(ghi.astype(bf), ws_lo,
                         preferred_element_type=jnp.float32)
               + jnp.dot(glo.astype(bf), ws_hi,
                         preferred_element_type=jnp.float32))
        o_ref[:, :] = src + ghi + glo

    run(gfull_body, (idx_col, nh, nl, ws),
        jax.ShapeDtypeStruct((rows, D), jnp.float32),
        "gather_full", (2 * 2 + 3 * 2) * rows * n_pad * D // (n_pad // D))
    # note: FLOP label approximate (gathers rows*n_pad*D x2; affines
    # rows*D*D x3)

    # ---- edge_mlp: per-tile conv edge pipeline -----------------------------
    e = jnp.asarray(rng.randn(rows, D), bf)
    w1 = jnp.asarray(rng.randn(D, D), jnp.float32)

    def silu(x):
        return x * jax.nn.sigmoid(x)

    def emlp_body(i, e_ref, w_ref, o_ref):
        x = e_ref[:, :].astype(jnp.float32) + o_ref[0:1, :] * 1e-30
        mm = lambda a: jnp.dot(a.astype(bf), w_ref[:, :].astype(bf),
                               preferred_element_type=jnp.float32)
        z = silu(mm(x))
        z = mm(z)
        z = silu(mm(silu(z)))
        z = mm(z)
        o_ref[:, :] = z

    run(emlp_body, (e, w1), jax.ShapeDtypeStruct((rows, D), jnp.float32),
        "edge_mlp", 4 * 2 * rows * D * D)

    # ---- repeat: the dst/ctr k-broadcast relayout --------------------------
    dst = jnp.asarray(rng.randn(tile_n, D), jnp.float32)

    def rep_body(i, d_ref, o_ref):
        o_ref[:, :] = jnp.repeat(d_ref[:, :] + o_ref[0:1, :] * 1e-30,
                                 k, axis=0)

    run(rep_body, (dst,), jax.ShapeDtypeStruct((rows, D), jnp.float32),
        "repeat", 0)

    # ---- full forward at production shapes ---------------------------------
    from gamd_tpu.core.config import TrainConfig, get_preset, lj_model_config
    from gamd_tpu.neighbors.dense import dense_neighbor_list
    from gamd_tpu.ops.pallas_model import mega_forward, pack_params
    from gamd_tpu.physics import lennard_jones as lj
    from gamd_tpu.train.state import build_model, create_train_state

    system = get_preset("lj", nbr_capacity=64)
    model_cfg = lj_model_config()
    state = create_train_state(build_model(model_cfg, system), system,
                               TrainConfig(), 1, rng=jax.random.PRNGKey(0))
    mp = pack_params(state.params, model_cfg)
    _, pos0 = lj.lj_fluid_box(system.n_atoms, 0.5)
    pos = jnp.asarray(pos0)
    idx, mask, _ = dense_neighbor_list(pos, system.box, system.cutoff + 0.5,
                                       64)
    order = jnp.argsort(jnp.where(mask, 0.0, 1.0), axis=1)[:, :k]
    idx = jnp.take_along_axis(idx, order, axis=1)
    mask = jnp.take_along_axis(mask, order, axis=1)
    h0 = jnp.broadcast_to(state.params["node_emb"][0],
                          (system.n_atoms, D))

    fwd = jax.jit(lambda p: mega_forward(
        p, idx, mask, h0, mp, system.box, system.cutoff, 1.0, 0.5,
        tile_n=tile_n, interpret=interp))
    out = fwd(pos)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(20):
            out = fwd(pos)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f"{'forward':14s} {best * 1e6:9.2f} us/call  "
          f"(includes launch ~20-30 us)")


if __name__ == "__main__":
    main()
