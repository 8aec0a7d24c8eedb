#!/usr/bin/env python
"""Megastep stage decomposition by ABLATION — the measurement-integrity-
proof replacement for scripts/bench_mxu.py's in-kernel timing loops.

Why: every in-kernel fori_loop microbenchmark design tried on this backend
produced impossible numbers (RESULTS.md "measurement-integrity finding" —
the round-4 carry-threaded rerun still printed 4,000-9,000 "TFLOP/s" against
a ~197 TFLOP/s chip, i.e. the loop collapsed or the timing granularity was
below what the tunnel can resolve). This script instead measures each stage
as an END-TO-END DELTA: it runs the production 4,000-step megastep bench
(identical methodology to bench.py — wall clock over ~1 s dispatches,
value-dependent outputs) with exactly one stage of the kernel neutralized
(ops.pallas_model `ablate=`), and reports

    stage cost = t_full - t_ablated   (us/step)

against the stage's matmul-FLOP floor at ~197 bf16 TFLOP/s. Deltas measure
the MARGINAL serial cost of a stage in the real pipeline (overlap included),
which is the honest answer to "where does the step time go". Numerics under
ablation are intentionally wrong (stages are replaced by cheap broadcasts);
no physics assertions are made.

Prints one JSON line per stage plus a summary.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gamd_tpu.core.config import MDConfig, TrainConfig, get_preset, \
    lj_model_config
from gamd_tpu.md.simulate import Simulation
from gamd_tpu.physics import lennard_jones as lj
from gamd_tpu.train.forcefield import GNNForceField
from gamd_tpu.train.state import build_model, create_train_state

PEAK_TFLOPS = 197.0     # v5e bf16

# (name, ablate tuple, description)
STAGES = [
    ("full", (), "production kernel (reference point)"),
    ("gather_pos", ("gather_pos",), "encoder position one-hot MXU gather"),
    ("gather_conv", ("gather_conv",), "per-layer node one-hot MXU gather"),
    ("srcaff", ("srcaff",), "post-gather src affine (K=3D dot)"),
    ("emlp", ("emlp",), "edge_affine e1/e2 matmuls"),
    ("theta", ("theta",), "theta_edge t1/t2 matmuls"),
    ("rbf", ("rbf",), "RBF exp + rbf->H matmul"),
    ("encmlp", ("encmlp",), "encoder w1/w2 matmuls"),
    ("acts", ("acts",), "all silu/gelu transcendentals (VPU)"),
    ("ln", ("ln",), "edge + node LayerNorm reductions (VPU)"),
    ("repeat", ("repeat",), "dst k-broadcast relayout"),
    ("agg", ("agg",), "masked [tile,k,d] K-sum reduction"),
    ("nodeops", ("nodeops",), "node-level dst/phi fp32 matmuls"),
    ("decoder", ("decoder",), "decoder MLP"),
    ("noise", ("noise",), "on-core PRNG + Box-Muller (VPU)"),
]


def flop_model(n, k, tile_n, d=128, h=128, e=128, n_layers=4, n_rbf_pad=128):
    """Matmul FLOPs per MD step owned by each ablatable stage."""
    n_rows = -(-n // tile_n) * tile_n
    n_pad = -(-n // 128) * 128
    rows = n_rows * k
    per_layer_gather = 2 * rows * n_pad * (2 * d)
    return {
        "gather_pos": 2 * rows * n_pad * 256,
        "gather_conv": n_layers * per_layer_gather,
        "srcaff": n_layers * 2 * rows * (3 * d) * h,
        "emlp": n_layers * 2 * 2 * rows * e * h,
        "theta": n_layers * 2 * 2 * rows * h * h,
        "rbf": 2 * rows * n_rbf_pad * h,
        "encmlp": 2 * 2 * rows * h * h,
        "nodeops": n_layers * 4 * 2 * n_rows * d * h,
        "decoder": 2 * n_rows * (d * h + h * 128),
        "acts": 0, "ln": 0, "repeat": 0, "agg": 0, "noise": 0, "full": 0,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tile_n", type=int,
                   default=int(os.environ.get("GAMD_BENCH_TILE_N", "136")))
    p.add_argument("--k_model", type=int, default=48)
    p.add_argument("--only", type=str, default=None,
                   help="comma-separated stage names to run")
    args = p.parse_args()

    system = get_preset("lj", skin=0.5, nbr_capacity=64)
    model_cfg = lj_model_config()
    state = create_train_state(
        build_model(model_cfg, system), system, TrainConfig(), 1,
        rng=jax.random.PRNGKey(0))
    ff = GNNForceField(state, system, model_cfg)
    md = MDConfig(integrator="langevin", temperature=system.temperature,
                  dt_fs=system.dt_fs, friction_per_ps=system.friction_per_ps,
                  rebuild_every=20)
    box, pos0 = lj.lj_fluid_box(system.n_atoms, 0.5)

    flops = flop_model(system.n_atoms, args.k_model, args.tile_n,
                       n_layers=model_cfg.conv_layers)
    only = set(args.only.split(",")) if args.only else None

    results = {}
    for name, ablate, desc in STAGES:
        if only and name not in only:
            continue
        sim = Simulation(
            ff.force_fn(megakernel=True, tile_n=args.tile_n), system, md,
            k_model=args.k_model,
            megastep_fn=ff.megastep_fn(tile_n=args.tile_n, ablate=ablate))
        st = sim.init_state(jnp.asarray(pos0), rng=jax.random.PRNGKey(1))
        t_c0 = time.perf_counter()
        result = sim.run(st, args.steps)           # compile + warmup
        jax.block_until_ready(result.state.pos)
        compile_s = time.perf_counter() - t_c0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            result = sim.run(st, args.steps)
            jax.block_until_ready(result.state.pos)
            times.append(time.perf_counter() - t0)
        times.sort()
        us = times[len(times) // 2] / args.steps * 1e6
        results[name] = us
        row = {"stage": name, "us_per_step": round(us, 1),
               "desc": desc, "compile_s": round(compile_s, 1)}
        if name != "full" and "full" in results:
            delta = results["full"] - us
            row["delta_us"] = round(delta, 1)
            floor = flops[name] / (PEAK_TFLOPS * 1e12) * 1e6
            row["flop_floor_us"] = round(floor, 1)
            if floor > 0 and delta > 0:
                row["mxu_eff_pct"] = round(100 * floor / delta, 1)
        print(json.dumps(row), flush=True)

    if "full" in results:
        explained = sum(results["full"] - v for k, v in results.items()
                        if k != "full" and results["full"] > v)
        total_floor = sum(flops[k] for k in results if k != "full") \
            / (PEAK_TFLOPS * 1e12) * 1e6
        print(json.dumps({
            "summary": "megastep decomposition",
            "full_us": round(results["full"], 1),
            "sum_of_deltas_us": round(explained, 1),
            "sum_flop_floor_us": round(total_floor, 1),
        }))


if __name__ == "__main__":
    main()
