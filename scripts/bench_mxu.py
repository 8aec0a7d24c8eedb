#!/usr/bin/env python
"""Bisection microbenchmark INSIDE the megastep kernel: which stage owns
the gap between the measured 255 us/step and the ~117 us FLOP floor?

STATUS (round-3/4): SUPERSEDED by scripts/bench_ablate.py. Even the
carry-threaded design below printed 4,000-9,000 "TFLOP/s" on the real
chip (>20x physical peak) — on this tunneled backend no in-kernel timing
loop has survived, so stage costs are now measured as end-to-end deltas
with one stage ablated from the production megastep kernel
(ops.pallas_model `ablate=`). This file is kept as the record of the
collapsed-loop failure modes and for the CPU-interpret calibration check.

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

Measurement integrity (hard-won): the first THREE designs of this loop
produced impossible numbers (5,167-8,400 "TFLOP/s", 25-40x chip peak;
every stage's wall time ~ launch + ONE iteration regardless of FLOP
content) because the in-kernel fori_loop was collapsed. Neither an
overwrite store + 1e-30 read-back, nor per-iteration accumulation into
o_ref, kept the iterations alive on the real Mosaic pipeline (ref
load/store forwarding reduces the chain before the loop survives).
The design that measures truthfully:
  1. the loop body is PURE — the accumulator rides the fori_loop CARRY
     (a value, not a ref), and o_ref is written ONCE after the loop, so
     the stored value is data-dependent on every iteration;
  2. every timed call receives a fresh salt input (guards any
     identical-call result reuse in the tunneled backend);
  3. a calibration check times the peak stage at iters and iters/4 and
     prints LOOP-COLLAPSED if the per-iteration times diverge.
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
    """Time fn(*args, salt) with a FRESH salt array per call.

    The salt is mixed into the kernel's compute at 1e-30 scale (timing
    noise only); it guarantees no two timed calls have bit-identical
    arguments, so no layer of the (tunneled) execution stack can serve a
    memoized result. The primary defense against the collapsed-loop
    artifact is the pure carry-threaded loop body plus the calibration
    check (see module docstring)."""
    rng = np.random.RandomState(hash(label) & 0xffff)
    salt = lambda: jnp.asarray(rng.randn(8, 128), jnp.float32)
    out = fn(*args, salt())
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        s = salt()
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        out = fn(*args, s)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    us = best / iters * 1e6
    tf = flops_per_iter / (best / iters) / 1e12 if flops_per_iter else 0.0
    print(f"{label:14s} {us:9.2f} us/iter   {tf:7.1f} TFLOP/s")
    return us


def loop_kernel(body):
    """Wrap a PURE `body(i, acc, *in_refs) -> acc'` in an iters-loop
    kernel. The accumulator is the fori_loop carry; o_ref is stored once
    after the loop, so every iteration is live by data dependence."""
    def kernel(*refs, iters):
        in_refs, o_ref = refs[:-1], refs[-1]
        acc = jnp.zeros_like(o_ref)
        acc = jax.lax.fori_loop(
            0, iters, lambda i, a: body(i, a, *in_refs), acc)
        o_ref[:, :] = acc
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

    def run(body, inputs, out_shape, label, flops, scratch=(),
            iters=None):
        # +1 input: the per-call salt array appended by timed().
        it = iters or args.iters
        kern = functools.partial(loop_kernel(body), iters=it)
        f = pl.pallas_call(
            kern,
            in_specs=[full()] * (len(inputs) + 1),
            out_specs=full(),
            out_shape=out_shape,
            scratch_shapes=list(scratch),
            # Mosaic's default 16 MB scoped-VMEM cap rejects the wide-M
            # stages (gather_mm_8M at tile_n>=32); v5e has 128 MB.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=interp,
        )
        jf = jax.jit(f)
        return timed(jf, inputs, it, label, flops)

    # ---- peak: dense bf16 matmul chain ------------------------------------
    a = jnp.asarray(rng.randn(512, 512) * 0.04, bf)
    w = jnp.asarray(rng.randn(512, 512) * 0.04, bf)

    def peak_body(i, acc, a_ref, w_ref, salt_ref):
        x = a_ref[:, :] + ((acc[0:1, :] * 1e-30).astype(bf)
                           + (salt_ref[0, 0] * 1e-30).astype(bf))
        for _ in range(4):
            x = jnp.dot(x, w_ref[:, :],
                        preferred_element_type=jnp.float32).astype(bf)
        return acc * 0.5 + x.astype(jnp.float32)

    t_full = run(peak_body, (a, w),
                 jax.ShapeDtypeStruct((512, 512), jnp.float32),
                 "peak", 4 * 2 * 512**3)
    it_q = max(1, args.iters // 4)
    t_q = run(peak_body, (a, w),
              jax.ShapeDtypeStruct((512, 512), jnp.float32),
              "peak_quarter", 4 * 2 * 512**3, iters=it_q)
    # Per-iter times should MATCH if the loop really runs; total time
    # ratio ~4. If per-iter at full iters is ~4x SMALLER, the loop
    # collapsed and every number below is garbage.
    ratio = (t_q * it_q) / max(t_full * args.iters, 1e-9) * (args.iters / it_q)
    tag = "OK" if 0.8 < ratio < 1.25 else "LOOP-COLLAPSED (numbers invalid)"
    # Physical sanity: the peak stage cannot beat the chip. If it claims
    # to, the loop collapsed no matter what the ratio says.
    peak_tf = 4 * 2 * 512**3 / (t_full * 1e-6) / 1e12
    if peak_tf > 250.0:
        tag = "LOOP-COLLAPSED (numbers invalid)"
    print(f"calibration: per-iter(quarter)/per-iter(full) = {ratio:.2f} "
          f"peak-stage {peak_tf:.0f} TFLOP/s vs ~197 physical [{tag}]")

    # ---- gather_mm: prebuilt one-hot x hi/lo node matrices ----------------
    onehot = jnp.asarray(
        (rng.randint(0, n_pad, (rows, 1)) ==
         np.arange(n_pad)[None, :]), bf)
    nh = jnp.asarray(rng.randn(n_pad, D), bf)
    nl = jnp.asarray(rng.randn(n_pad, D) * 1e-3, bf)

    def gmm_body(i, acc, oh_ref, nh_ref, nl_ref, salt_ref):
        nh_eff = nh_ref[:, :] + ((acc[0:1, :] * 1e-30).astype(bf)
                                 + (salt_ref[0, 0] * 1e-30).astype(bf))
        ghi = jnp.dot(oh_ref[:, :], nh_eff,
                      preferred_element_type=jnp.float32)
        glo = jnp.dot(oh_ref[:, :], nl_ref[:, :],
                      preferred_element_type=jnp.float32)
        return acc * 0.5 + ghi + glo

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

    def gfull_body(i, acc, idx_ref, nh_ref, nl_ref, ws_ref, salt_ref):
        # idx depends on the carry so the one-hot build re-executes per iter.
        idx_eff = idx_ref[:, :] + (acc[0, 0] * 1e-30
                                   + salt_ref[0, 0] * 1e-30).astype(jnp.int32)
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
        return acc * 0.5 + src + ghi + glo

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

    def emlp_body(i, acc, e_ref, w_ref, salt_ref):
        x = (e_ref[:, :].astype(jnp.float32) + acc[0:1, :] * 1e-30
             + salt_ref[0, 0] * 1e-30)
        mm = lambda a: jnp.dot(a.astype(bf), w_ref[:, :].astype(bf),
                               preferred_element_type=jnp.float32)
        z = silu(mm(x))
        z = mm(z)
        z = silu(mm(silu(z)))
        z = mm(z)
        return acc * 0.5 + z

    run(emlp_body, (e, w1), jax.ShapeDtypeStruct((rows, D), jnp.float32),
        "edge_mlp", 4 * 2 * rows * D * D)

    # ---- repeat: the dst/ctr k-broadcast relayout --------------------------
    dst = jnp.asarray(rng.randn(tile_n, D), jnp.float32)

    def rep_body(i, acc, d_ref, salt_ref):
        return acc * 0.5 + jnp.repeat(
            d_ref[:, :] + acc[0:1, :] * 1e-30 + salt_ref[0, 0] * 1e-30,
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

    def fwd_one(p):
        return mega_forward(
            p, idx, mask, h0, mp, system.box, system.cutoff, 1.0, 0.5,
            tile_n=tile_n, interpret=interp)

    # ONE device dispatch for all repetitions: chain each forward's output
    # back into the next call's positions (at 1e-7 scale) inside a scan —
    # per-call tunnel dispatch is ~1-2 ms on this backend, which swamps a
    # ~200 us kernel if each repetition is its own dispatch.
    n_rep = 20

    @jax.jit
    def fwd_chain(p):
        def step(pc, _):
            f = fwd_one(pc)
            return pc + 1e-7 * f, f[0, 0]
        _, trace = jax.lax.scan(step, p, None, length=n_rep)
        return trace

    out = fwd_chain(pos)
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(5):
        p_r = pos + jnp.float32(1e-5 * (r + 1))   # distinct args per call
        jax.block_until_ready(p_r)
        t0 = time.perf_counter()
        out = fwd_chain(p_r)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_rep)
    print(f"{'forward':14s} {best * 1e6:9.2f} us/call  "
          f"(scan-chained, dispatch amortized over {n_rep})")


if __name__ == "__main__":
    main()
