#!/usr/bin/env python
"""Aggregate multi-replica GNN-MD throughput (secondary benchmark).

A single 258-atom chain cannot fill a TPU's MXU; R independent replicas
stepped in lockstep amortize per-op overheads and measure the chip's
aggregate MD capacity (the relevant number for sampling workloads: R
trajectories for RDF statistics, replica exchange, etc.).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    from gamd_tpu.core.config import (MDConfig, TrainConfig, get_preset,
                                      lj_model_config)
    from gamd_tpu.md.simulate import Simulation
    from gamd_tpu.physics import lennard_jones as lj
    from gamd_tpu.train.forcefield import GNNForceField
    from gamd_tpu.train.state import build_model, create_train_state

    n_replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    system = get_preset("lj", skin=0.5, nbr_capacity=64)
    model_cfg = lj_model_config()
    state = create_train_state(build_model(model_cfg, system), system,
                               TrainConfig(), 1, rng=jax.random.PRNGKey(0))
    ff = GNNForceField(state, system, model_cfg)
    # GAMD_BENCH_INTEGRATOR=nose_hoover measures the fused NHC replica
    # path (batch-polymorphic chain, no megastep — NHC chain state stays
    # in the XLA scan).
    integ = os.environ.get("GAMD_BENCH_INTEGRATOR", "langevin")
    md = MDConfig(integrator=integ, temperature=system.temperature,
                  friction_per_ps=25.0, rebuild_every=20)
    # Megakernel with the explicit replica grid dimension (round 1's vmap
    # lowering collapsed to ~208 steps/s/replica). The megastep path runs
    # the whole replica batch's neighbor-reuse window in one program.
    k_model = int(os.environ.get("GAMD_BENCH_K_MODEL", "48")) or None
    sim = Simulation(ff.force_fn(megakernel=True), system, md,
                     k_model=k_model,
                     megastep_fn=(ff.megastep_fn()
                                  if integ == "langevin" else None))
    _, pos0 = lj.lj_fluid_box(system.n_atoms, 0.5)

    states = sim.init_replicas(jnp.asarray(pos0), n_replicas,
                               rng=jax.random.PRNGKey(1))
    result = sim.run_replicas(states, n_steps)           # compile + warmup
    jax.block_until_ready(result.state.pos)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        result = sim.run_replicas(states, n_steps)
        jax.block_until_ready(result.state.pos)
    dt = (time.perf_counter() - t0) / reps
    agg = n_replicas * n_steps / dt
    print(json.dumps({
        "metric": f"aggregate GNN-MD steps/s ({n_replicas} replicas x "
                  "258-atom LJ)",
        "value": round(agg, 1),
        "unit": "steps/s",
        "per_replica": round(n_steps / dt, 1),
    }))


if __name__ == "__main__":
    main()
