#!/usr/bin/env python
"""Large-N scaling benchmark (BASELINE.json stretch config rung 1).

Measures fused MD throughput at 10k-100k atoms single-chip through the
jit-compatible cell list (Simulation(nbr_method='cell')) for the classical
LJ potential, plus GNN-MD at the largest size the XLA gather path holds.
The megakernel path is intentionally NOT used here: its one-hot MXU gather
is O(N^2) in FLOPs and is the right trade only for small N (the 258-atom
headline config); large N uses XLA's native row gathers.

Prints one JSON line per configuration.

Example:
    python scripts/bench_large.py --sizes 10000 100000 --steps 200
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", nargs="+", type=int,
                        default=[10_000, 100_000])
    parser.add_argument("--gnn_size", type=int, default=4096,
                        help="atoms for the GNN-MD large config (0 = skip)")
    parser.add_argument("--gnn_banded_sizes", nargs="*", type=int,
                        default=[4096, 10_000],
                        help="atoms for the banded-gather GNN-MD configs")
    parser.add_argument("--banded_tile", type=int, default=64)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--k_max", type=int, default=96)
    parser.add_argument("--cpu", action="store_true",
                        help="debug: force the CPU backend (the axon TPU "
                             "plugin ignores JAX_PLATFORMS)")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gamd_tpu.core.config import MDConfig, TrainConfig, get_preset, \
        lj_model_config
    from gamd_tpu.md.simulate import Simulation
    from gamd_tpu.physics import lennard_jones as lj
    from gamd_tpu.train.forcefield import GNNForceField
    from gamd_tpu.train.state import build_model, create_train_state

    def bench(sim, pos, steps, label, n):
        st = sim.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(1))
        r = sim.run(st, steps)                       # compile + warm
        jax.block_until_ready(r.state.pos)
        if bool(r.overflow):
            print(json.dumps({"config": label, "error": "nbr overflow"}))
            return
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = sim.run(st, steps)
            jax.block_until_ready(r.state.pos)
            times.append(time.perf_counter() - t0)
        sps = steps / sorted(times)[1]
        print(json.dumps({
            "config": label, "atoms": n, "steps_per_s": round(sps, 2),
            "atom_steps_per_s": round(sps * n, 0),
            "ms_per_step": round(1000 * sorted(times)[1] / steps, 3)}),
            flush=True)

    for n in args.sizes:
        system = get_preset("lj", n_atoms=n, nbr_capacity=args.k_max,
                            skin=0.5)
        # scale the box to keep reduced density 0.5
        box, pos = lj.lj_fluid_box(n, 0.5)
        system = get_preset("lj", n_atoms=n, box=float(box),
                            nbr_capacity=args.k_max, skin=0.5)
        md = MDConfig(integrator="langevin", temperature=100.0, dt_fs=2.0,
                      friction_per_ps=25.0, rebuild_every=20)
        sim = Simulation(lj.lj_force_fn(system.box), system, md,
                         nbr_method="cell")
        bench(sim, pos, args.steps, f"classical-LJ cell-list N={n}", n)

    if args.gnn_size:
        n = args.gnn_size
        box, pos = lj.lj_fluid_box(n, 0.5)
        system = get_preset("lj", n_atoms=n, box=float(box),
                            nbr_capacity=args.k_max, skin=0.5)
        model_cfg = lj_model_config()
        state = create_train_state(build_model(model_cfg, system), system,
                                   TrainConfig(), 1,
                                   rng=jax.random.PRNGKey(0))
        ff = GNNForceField(state, system, model_cfg)
        md = MDConfig(integrator="langevin", temperature=100.0, dt_fs=2.0,
                      friction_per_ps=25.0, rebuild_every=20)
        sim = Simulation(ff.force_fn(), system, md, nbr_method="cell")
        bench(sim, pos, max(args.steps // 4, 20), f"GNN-MD cell-list N={n}",
              n)

    for n in args.gnn_banded_sizes:
        # Banded-gather GNN-MD (ops.banded): the large-N scaling path.
        box, pos = lj.lj_fluid_box(n, 0.5)
        system = get_preset("lj", n_atoms=n, box=float(box),
                            nbr_capacity=args.k_max, skin=0.5)
        model_cfg = lj_model_config()
        state = create_train_state(build_model(model_cfg, system), system,
                                   TrainConfig(), 1,
                                   rng=jax.random.PRNGKey(0))
        ff = GNNForceField(state, system, model_cfg)
        md = MDConfig(integrator="langevin", temperature=100.0, dt_fs=2.0,
                      friction_per_ps=25.0, rebuild_every=20)
        bfn = ff.banded_force_fn(tile_n=args.banded_tile,
                                 interpret=args.cpu)
        sim = Simulation(bfn, system, md, nbr_method="cell")
        bench(sim, pos, max(args.steps // 4, 20),
              f"GNN-MD banded N={n} band={bfn.banded_band}", n)


if __name__ == "__main__":
    main()
