#!/usr/bin/env python
"""Capture a device trace of the GNN force scan and print per-op totals."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    from gamd_tpu.core.config import TrainConfig, get_preset, lj_model_config
    from gamd_tpu.neighbors.dense import dense_neighbor_list
    from gamd_tpu.physics import lennard_jones as lj
    from gamd_tpu.train.forcefield import GNNForceField
    from gamd_tpu.train.state import build_model, create_train_state

    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    use_pallas = "pallas" in sys.argv
    system = get_preset("lj", skin=0.5, nbr_capacity=64)
    model_cfg = lj_model_config(compute_dtype=dtype, use_pallas=use_pallas)
    print("use_pallas:", use_pallas)
    state = create_train_state(build_model(model_cfg, system), system,
                               TrainConfig(), 1, rng=jax.random.PRNGKey(0))
    ff = GNNForceField(state, system, model_cfg)
    box, pos0 = lj.lj_fluid_box(system.n_atoms, 0.5)
    pos = jnp.asarray(pos0)
    idx, mask, _ = dense_neighbor_list(pos, system.box,
                                       system.cutoff + system.skin,
                                       system.nbr_capacity)
    force = ff.force_fn()

    @jax.jit
    def run(p):
        def body(x, _):
            return x + 1e-9 * force(x, idx, mask), None
        return jax.lax.scan(body, p, None, length=200)[0]

    out = run(pos)
    jax.block_until_ready(out)

    logdir = "/tmp/gamd_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out = run(pos)
        jax.block_until_ready(out)

    # Parse the perfetto trace: sum device-track event durations by op name.
    traces = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no trace file found; files:",
              glob.glob(f"{logdir}/**/*", recursive=True))
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Identify device PIDs (process names containing TPU).
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "tpu" in n or "/device" in n.lower()}
    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            totals[e["name"]] += e.get("dur", 0.0)
            counts[e["name"]] += 1
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    grand = sum(totals.values())
    print(f"pids: { {p: pid_names[p] for p in device_pids} }")
    print(f"total device time: {grand/1e3:.2f} ms over 200 steps "
          f"-> {grand/200:.1f} us/step")
    for name, dur in items[:35]:
        print(f"{dur/200:9.2f} us/step  x{counts[name]:6d}  {name[:90]}")


if __name__ == "__main__":
    main()
