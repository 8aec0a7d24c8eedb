"""Headline benchmark: fused GNN-MD throughput for 258-atom LJ on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N/target}

The metric is full MD steps per second — each step is neighbor-mask refresh +
GAMD-small GNN force evaluation + BAOAB Langevin update, all inside one
jitted lax.scan (neighbor indices rebuilt every `rebuild_every` steps inside
the same program). Baseline target: 1e5 steps/s (BASELINE.md; the reference
publishes no throughput at all — its per-step path crosses four frameworks
and the host).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Tuning knobs for on-chip sweeps (driver runs plain `python bench.py`).
# tile_n=136 won the round-3 on-chip sweep (4,548 steps/s vs 4,140 at 16,
# 4,122 at 32, 4,218 at 72; 272 exceeded the compile budget): two 136-row
# tiles cover N=258, and each gather/edge matmul runs at M=6,528 rows
# instead of 768 — better MXU utilization per program invocation.
TILE_N = int(os.environ.get("GAMD_BENCH_TILE_N", "136"))
# k_model=48: nearest-48 slice of the distance-sorted build list (K=64),
# overflow-guarded (the guard would flag any dropped cutoff+skin neighbor;
# LJ-258 at rho*=0.5 tops out ~45). ~25% FLOP cut, measured safe.
K_MODEL = os.environ.get("GAMD_BENCH_K_MODEL", "48")
K_MODEL = int(K_MODEL) if K_MODEL else None

from gamd_tpu.core.config import MDConfig, TrainConfig, get_preset, lj_model_config
from gamd_tpu.md.simulate import Simulation
from gamd_tpu.physics import lennard_jones as lj
from gamd_tpu.train.forcefield import GNNForceField
from gamd_tpu.train.state import build_model, create_train_state

BASELINE_STEPS_PER_S = 1e5


def main():
    # Bench config: bf16 matmuls on the MXU; neighbor list built at
    # cutoff + 0.5 A skin with K=64 (thermal drift over a 20-step reuse
    # window is ~0.06 A, and overflow is still detected and reported).
    system = get_preset("lj", skin=0.5, nbr_capacity=64)
    # Whole-model megakernel (ops.pallas_model): one Pallas program from
    # positions to forces — featurization, encoder, all conv layers (edge
    # embedding VMEM-resident throughout), decoder, and the true-cutoff
    # mask refresh. The XLA fallback runs everything fp32.
    model_cfg = lj_model_config()
    # Architecture-only benchmark: untrained weights, real compute graph.
    state = create_train_state(
        build_model(model_cfg, system), system, TrainConfig(), 1,
        rng=jax.random.PRNGKey(0))
    ff = GNNForceField(state, system, model_cfg)

    md = MDConfig(integrator="langevin", temperature=system.temperature,
                  dt_fs=system.dt_fs, friction_per_ps=system.friction_per_ps,
                  rebuild_every=20)
    # Multi-step fused path: the whole 20-step neighbor-reuse window runs
    # as ONE Pallas program (in-kernel BAOAB + on-core PRNG noise); set
    # GAMD_BENCH_MEGASTEP=0 to fall back to one kernel per step.
    megastep = os.environ.get("GAMD_BENCH_MEGASTEP", "1") != "0"
    sim = Simulation(ff.force_fn(megakernel=True, tile_n=TILE_N), system,
                     md, k_model=K_MODEL,
                     megastep_fn=(ff.megastep_fn(tile_n=TILE_N)
                                  if megastep else None))

    box, pos0 = lj.lj_fluid_box(system.n_atoms, 0.5)
    st = sim.init_state(jnp.asarray(pos0), rng=jax.random.PRNGKey(1))

    n_steps = 4000
    if os.environ.get("GAMD_BENCH_COMPILE_ONLY"):
        # Populate the persistent compile cache (chipless AOT helper) and
        # exit without touching the chip — lets the real bench start hot.
        sim._make_run(n_steps).lower(st).compile()
        print(json.dumps({"compile_only": True, "tile_n": TILE_N}))
        return
    # Warmup: compile + one run.
    result = sim.run(st, n_steps)
    jax.block_until_ready(result.state.pos)
    assert not bool(result.overflow), "neighbor capacity overflow in bench"
    assert bool(jnp.isfinite(result.state.pos).all())

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        result = sim.run(st, n_steps)
        jax.block_until_ready(result.state.pos)
        times.append(time.perf_counter() - t0)
    times.sort()
    steps_per_s = n_steps / times[len(times) // 2]   # median rep

    print(json.dumps({
        "metric": "fused GNN-MD steps/s (258-atom LJ, GAMD-small + BAOAB)",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
