#!/usr/bin/env python
"""On-chip probe: can any Mosaic-expressible gather beat the one-hot MXU dot?

Round-4 VERDICT #1: ~91 us/step of the megakernel is one-hot gather
IMPLEMENTATION FLOPs (conv gathers 52.1 + encoder gather 13.0 + post-gather
src affine 26.1), not architecture math. This probe measures, on the real
chip with the collapse-proof carry-accumulator methodology
(RESULTS.md "Measurement-integrity finding"), the per-gather cost of every
alternative Mosaic can express:

  A. one-hot MXU dot      out[e,:] = onehot[e,:] @ T[384, 256]   (baseline)
  B. lane dynamic_gather  outT[d,eb] = TT[d, idx[eb]] via
                          jnp.take_along_axis(axis=1) -> tpu.dynamic_gather,
                          34 calls of [256, 384] per full edge stream
  B2. lane dynamic_gather with 128-lane subtables (3 gathers + 2 selects)
      in case multi-block lane gather is unsupported/slow
  C. sublane dynamic_gather out[eb,:] = T[idx[eb], :] via
                          take_along_axis(axis=0), 34 calls of [384, 256]
  T. tpu.transpose of a [256, 384] f32 block (the layout-conversion tax the
     transposed variants would pay to feed the row-major edge pipeline)

Each variant runs ITERS times inside one kernel with the result threaded
through the fori_loop carry; a second run at ITERS//4 must take ~1/4 the
time (printed as `calib`), else the loop collapsed and the number is
invalid. Shapes mirror the production megakernel at LJ-258/tile_n=136:
edge stream 13056 rows, table [384 rows | 272 live, 256 lanes] bf16.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 13056          # 272 padded atoms x K=48
N_PAD = 384           # 128-aligned node table rows
N_LIVE = 258
LANES = 256           # hi|lo packed feature lanes
EB = 384              # edges per dynamic-gather block
N_BLOCKS = ROWS // EB  # 34


def _acc_update(acc, out):
    # Fold a FULL reduction of `out` into the carry so no element of the
    # iteration's result can be DCE'd and the loop cannot collapse
    # (accumulator rides the CARRY; a partial slice lets Mosaic compute
    # just that slice — the r4a probe run collapsed exactly that way).
    return acc + jnp.sum(out.astype(jnp.float32))


def _dep_scalar(acc):
    # Data-dependent, non-foldable zero: `acc * 0` constant-folds, a
    # runtime comparison against the carry cannot.
    return jnp.where(acc[0, 0] > 1e30, 1.0, 0.0).astype(jnp.float32)


def kernel_onehot(idx_ref, tbl_ref, out_ref, oh_scr, *, iters):
    def fill(t, _):
        r0 = pl.multiple_of(t * 1632, 1632)
        idx_t = idx_ref[pl.ds(r0, 1632), :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (1632, N_PAD), 1)
        oh_scr[pl.ds(r0, 1632), :] = (iota == idx_t).astype(jnp.bfloat16)
        return 0
    jax.lax.fori_loop(0, ROWS // 1632, fill, 0)

    def body(i, acc):
        tbl_dep = tbl_ref[:, :] + _dep_scalar(acc).astype(jnp.bfloat16)
        g = jnp.dot(oh_scr[:, :], tbl_dep,
                    preferred_element_type=jnp.float32)
        return _acc_update(acc, g)
    out_ref[:, :] = jax.lax.fori_loop(
        0, iters, body, jnp.zeros((8, 128), jnp.float32))


def kernel_onehot_int8(idx_ref, tbl_ref, out_ref, oh_scr, *, iters,
                       tbl_int8):
    """Round-5 probe (VERDICT #3a): int8 one-hot operand. Row selection is
    exactly representable in int8, so IF Mosaic runs int8 (or mixed
    int8 x bf16) MXU dots at >= 2x the bf16 rate, the gather FLOP floor
    halves with zero accuracy loss on the one-hot side (int8 x int8 would
    additionally need a quantized table — rate probe only)."""
    def fill(t, _):
        r0 = pl.multiple_of(t * 1632, 1632)
        idx_t = idx_ref[pl.ds(r0, 1632), :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (1632, N_PAD), 1)
        oh_scr[pl.ds(r0, 1632), :] = (iota == idx_t).astype(jnp.int8)
        return 0
    jax.lax.fori_loop(0, ROWS // 1632, fill, 0)

    def body(i, acc):
        if tbl_int8:
            dep = jnp.where(acc[0, 0] > 1e30, 1, 0).astype(jnp.int8)
            g = jnp.dot(oh_scr[:, :], tbl_ref[:, :] + dep,
                        preferred_element_type=jnp.int32)
        else:
            tbl_dep = tbl_ref[:, :] + _dep_scalar(acc).astype(jnp.bfloat16)
            g = jnp.dot(oh_scr[:, :], tbl_dep,
                        preferred_element_type=jnp.float32)
        return _acc_update(acc, g)
    out_ref[:, :] = jax.lax.fori_loop(
        0, iters, body, jnp.zeros((8, 128), jnp.float32))


def kernel_onehot_banded(idx_ref, starts_ref, tbl_ref, out_ref, oh_scr, *,
                         iters, band):
    """Round-5 probe (VERDICT #3b): banded gather. After an x-sort, each
    tile's neighbor indices fall inside a `band`-row window of the node
    table (at LJ-258 with 4+ tiles: ~207 rows < 256), so the one-hot dot
    contracts over K=band instead of K=n_pad. MXU K-passes quantize at
    128, so band=256 is 2 passes vs the baseline's 3 — the honest ceiling
    of the FLOP cut without a native gather. The dynamic 16-aligned window
    start exercises the dynamic-slice + dot lowering the production port
    would need."""
    n_band_tiles = ROWS // 1632
    def fill(t, _):
        r0 = pl.multiple_of(t * 1632, 1632)
        s = pl.multiple_of(starts_ref[t], 16)
        idx_t = idx_ref[pl.ds(r0, 1632), :] - s
        iota = jax.lax.broadcasted_iota(jnp.int32, (1632, band), 1)
        oh_scr[pl.ds(r0, 1632), :] = (iota == idx_t).astype(jnp.bfloat16)
        return 0
    jax.lax.fori_loop(0, n_band_tiles, fill, 0)

    def body(i, acc):
        dep = _dep_scalar(acc).astype(jnp.bfloat16)
        def tile(t, acc2):
            r0 = pl.multiple_of(t * 1632, 1632)
            s = pl.multiple_of(starts_ref[t], 16)
            g = jnp.dot(oh_scr[pl.ds(r0, 1632), :],
                        tbl_ref[pl.ds(s, band), :] + dep,
                        preferred_element_type=jnp.float32)
            return _acc_update(acc2, g)
        return jax.lax.fori_loop(0, n_band_tiles, tile, acc)
    out_ref[:, :] = jax.lax.fori_loop(
        0, iters, body, jnp.zeros((8, 128), jnp.float32))


def kernel_lane(idxb_ref, tblT_ref, out_ref, *, iters, width):
    """take_along_axis(axis=1): out[d, e] = TT[d, idx[e]].

    width=384: single gather over 3 lane blocks (if Mosaic supports it).
    width=128: 3 subtable gathers + 2 selects (idx % 128, select by idx//128).
    """
    def body(i, acc):
        dep = _dep_scalar(acc).astype(jnp.int32)  # carry dependency
        def block(b, acc2):
            idx = idxb_ref[pl.ds(b * 8, 8), :]              # [8, EB]
            idx_b = jnp.broadcast_to(idx[0:1, :], (LANES, EB)) + dep
            if width == 384:
                x = tblT_ref[:, :]                           # [256, 384]
                g = jnp.take_along_axis(x, idx_b, axis=1,
                                        mode="promise_in_bounds")
            else:
                parts = []
                for s in range(3):
                    sub = tblT_ref[:, pl.ds(s * 128, 128)]   # [256, 128]
                    sub_idx = jnp.clip(idx_b - s * 128, 0, 127)
                    parts.append(jnp.take_along_axis(
                        sub, sub_idx, axis=1, mode="promise_in_bounds"))
                blk = idx_b // 128
                g = jnp.where(blk == 0, parts[0],
                              jnp.where(blk == 1, parts[1], parts[2]))
            return _acc_update(acc2, g)
        return jax.lax.fori_loop(0, N_BLOCKS, block, acc)
    out_ref[:, :] = jax.lax.fori_loop(
        0, iters, body, jnp.zeros((8, 128), jnp.float32))


def kernel_sublane(idxb_ref, tbl_ref, out_ref, *, iters):
    """take_along_axis(axis=0): out[e, :] = T[idx[e], :] in [384, 256]
    blocks (34 per edge stream)."""
    def body(i, acc):
        dep = _dep_scalar(acc).astype(jnp.int32)
        def block(b, acc2):
            idx = idxb_ref[pl.ds(b * 8, 8), :]               # [8, EB]
            # want column vector [EB, LANES] of indices
            idx_col = jnp.broadcast_to(
                idx[0:1, :].reshape(EB, 1), (EB, LANES)) + dep
            g = jnp.take_along_axis(tbl_ref[:, :], idx_col, axis=0,
                                    mode="promise_in_bounds")
            return _acc_update(acc2, g)
        return jax.lax.fori_loop(0, N_BLOCKS, block, acc)
    out_ref[:, :] = jax.lax.fori_loop(
        0, iters, body, jnp.zeros((8, 128), jnp.float32))


def kernel_transpose(tblT_ref, out_ref, *, iters):
    def body(i, acc):
        def block(b, acc2):
            x = tblT_ref[:, :] + _dep_scalar(acc2)           # [256, 384]
            return _acc_update(acc2, x.T)
        return jax.lax.fori_loop(0, N_BLOCKS, block, acc)
    out_ref[:, :] = jax.lax.fori_loop(
        0, iters, body, jnp.zeros((8, 128), jnp.float32))


def run_variant(name, make_call, iters):
    # make_call MUST return a single jit-wrapped callable that is reused
    # across timing calls. The r4a-r4c runs wrapped a FRESH
    # `jax.jit(lambda: ...)` per invocation, so every timed call re-traced
    # and hit the persistent compile cache — the "timings" were cache
    # deserialization (identical for full vs quarter runs, hence the
    # calib_ratio ~1.0 flags), not kernel execution.
    try:
        f = make_call(iters)
        t0 = time.time()
        r = jax.block_until_ready(f())
        compile_s = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(f())
        full = time.time() - t0
        f4 = make_call(max(1, iters // 4))
        jax.block_until_ready(f4())
        t0 = time.time()
        jax.block_until_ready(f4())
        quarter = time.time() - t0
        calib = full / max(quarter, 1e-9)
        per_iter_us = full / iters * 1e6
        status = "OK" if 2.8 < calib < 5.2 else "LOOP-COLLAPSED?"
        print(json.dumps({
            "variant": name, "per_edge_stream_us": round(per_iter_us, 2),
            "calib_ratio": round(calib, 2), "status": status,
            "compile_s": round(compile_s, 1)}), flush=True)
        return per_iter_us, status
    except Exception as e:  # lowering not supported -> evidence too
        full = f"{type(e).__name__}: {e}"
        lines = [ln.strip() for ln in full.split("\n")
                 if any(t in ln for t in ("Mosaic", "INTERNAL", "error:",
                                          "Unsupported", "not implemented",
                                          "NotImplemented", "failed"))]
        nonempty = [ln.strip() for ln in full.split("\n") if ln.strip()]
        msg = (" | ".join(lines[:6]) or " | ".join(nonempty[:3]))[:1200]
        print(json.dumps({"variant": name, "error": msg}), flush=True)
        return None, "ERROR"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="interpreter-mode shape/trace smoke test (no "
                         "Mosaic lowering exercised)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.RandomState(0)
    idx = rng.randint(0, N_LIVE, (ROWS, 1)).astype(np.int32)
    idx_blocks = idx.reshape(N_BLOCKS, EB)           # [34, 384]
    # one row per block, replicated to 8 sublanes for clean vreg loads
    idxb = np.repeat(idx_blocks, 8, axis=0).astype(np.int32)  # [272, 384]
    tbl = rng.randn(N_PAD, LANES).astype(np.float32)
    tblT = np.ascontiguousarray(tbl.T[:, :N_PAD])    # [256, 384]

    vmem = pltpu.CompilerParams(vmem_limit_bytes=112 * 2**20)
    out_sd = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def call_onehot(iters):
        k = functools.partial(kernel_onehot, iters=iters)
        fn = pl.pallas_call(
            k, out_shape=out_sd, in_specs=[full(), full()],
            out_specs=full(),
            scratch_shapes=[pltpu.VMEM((ROWS, N_PAD), jnp.bfloat16)],
            compiler_params=vmem, interpret=args.interpret)
        a, b = jnp.asarray(idx), jnp.asarray(tbl, jnp.bfloat16)
        return jax.jit(lambda: fn(a, b))

    def call_onehot_int8(iters, tbl_int8):
        k = functools.partial(kernel_onehot_int8, iters=iters,
                              tbl_int8=tbl_int8)
        fn = pl.pallas_call(
            k, out_shape=out_sd, in_specs=[full(), full()],
            out_specs=full(),
            scratch_shapes=[pltpu.VMEM((ROWS, N_PAD), jnp.int8)],
            compiler_params=vmem, interpret=args.interpret)
        a = jnp.asarray(idx)
        b = (jnp.asarray((tbl * 8).astype(np.int8)) if tbl_int8
             else jnp.asarray(tbl, jnp.bfloat16))
        return jax.jit(lambda: fn(a, b))

    def call_onehot_banded(iters, band):
        # Per-tile 16-aligned window starts; indices clipped into each
        # tile's window so the one-hot rebase stays in-range (the probe
        # measures RATE; the production port would get in-range indices
        # from the x-sort).
        n_bt = ROWS // 1632
        starts_np = (np.linspace(0, N_PAD - band, n_bt) // 16 * 16
                     ).astype(np.int32)
        idx_b = idx.reshape(n_bt, 1632, 1)
        idx_b = np.clip(idx_b, starts_np[:, None, None],
                        starts_np[:, None, None] + band - 1)
        k = functools.partial(kernel_onehot_banded, iters=iters, band=band)
        fn = pl.pallas_call(
            k, out_shape=out_sd,
            in_specs=[full(), pl.BlockSpec(memory_space=pltpu.SMEM),
                      full()],
            out_specs=full(),
            scratch_shapes=[pltpu.VMEM((ROWS, band), jnp.bfloat16)],
            compiler_params=vmem, interpret=args.interpret)
        a = jnp.asarray(idx_b.reshape(ROWS, 1))
        s = jnp.asarray(starts_np)
        b = jnp.asarray(tbl, jnp.bfloat16)
        return jax.jit(lambda: fn(a, s, b))

    def call_lane(iters, width):
        k = functools.partial(kernel_lane, iters=iters, width=width)
        fn = pl.pallas_call(
            k, out_shape=out_sd, in_specs=[full(), full()],
            out_specs=full(), compiler_params=vmem, interpret=args.interpret)
        a, b = jnp.asarray(idxb), jnp.asarray(tblT)
        return jax.jit(lambda: fn(a, b))

    def call_sublane(iters):
        k = functools.partial(kernel_sublane, iters=iters)
        fn = pl.pallas_call(
            k, out_shape=out_sd, in_specs=[full(), full()],
            out_specs=full(), compiler_params=vmem, interpret=args.interpret)
        a, b = jnp.asarray(idxb), jnp.asarray(tbl)
        return jax.jit(lambda: fn(a, b))

    def call_transpose(iters):
        k = functools.partial(kernel_transpose, iters=iters)
        fn = pl.pallas_call(
            k, out_shape=out_sd, in_specs=[full()],
            out_specs=full(), compiler_params=vmem, interpret=args.interpret)
        b = jnp.asarray(tblT)
        return jax.jit(lambda: fn(b))

    print(f"backend: {jax.devices()[0]}", flush=True)
    print(f"shapes: edge stream {ROWS}x{LANES}, table {N_PAD}({N_LIVE} live)"
          f"x{LANES}; {N_BLOCKS} blocks of {EB} edges", flush=True)
    results = {}
    results["onehot_dot"] = run_variant(
        "onehot_dot (baseline)", call_onehot, args.iters)
    results["onehot_int8_mixed"] = run_variant(
        "one-hot int8 x bf16 table (rate probe)",
        lambda it: call_onehot_int8(it, False), args.iters)
    results["onehot_int8_int8"] = run_variant(
        "one-hot int8 x int8 table (rate probe)",
        lambda it: call_onehot_int8(it, True), args.iters)
    results["onehot_banded_256"] = run_variant(
        "banded one-hot K=256 (2 MXU passes vs 3)",
        lambda it: call_onehot_banded(it, 256), args.iters)
    results["onehot_banded_208"] = run_variant(
        "banded one-hot K=208 (x-sort tight band)",
        lambda it: call_onehot_banded(it, 208), args.iters)
    results["lane_384"] = run_variant(
        "lane dynamic_gather width=384",
        lambda it: call_lane(it, 384), args.iters)
    results["lane_128x3"] = run_variant(
        "lane dynamic_gather 3x128 + select",
        lambda it: call_lane(it, 128), args.iters)
    results["sublane"] = run_variant(
        "sublane dynamic_gather", call_sublane, max(200, args.iters // 10))
    results["transpose"] = run_variant(
        "tpu.transpose 256x384 blocks", call_transpose, args.iters)
    print("SUMMARY " + json.dumps(
        {k: (None if v[0] is None else round(v[0], 2))
         for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
