#!/usr/bin/env python
"""Bisection profile of the fused MD step: where do the microseconds go?

Times scans of increasingly complete step bodies to separate per-iteration
launch/overhead floor from compute: trivial op, integrator-only, neighbor
mask refresh, edge features, full GNN force, full MD step; fp32 vs bf16.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(body, carry, n=2000, reps=3, label=""):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (body(c), None), c, None, length=n)[0]

    out = run(carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(carry)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    us = dt / n * 1e6
    print(f"{label:42s} {us:9.1f} us/step   ({n/dt:,.0f} steps/s)")
    return us


def main():
    from gamd_tpu.core import space
    from gamd_tpu.core.config import TrainConfig, get_preset, lj_model_config
    from gamd_tpu.models.gnn import edge_geometry, rbf_expand
    from gamd_tpu.neighbors.dense import dense_neighbor_list, refresh_mask
    from gamd_tpu.physics import lennard_jones as lj
    from gamd_tpu.train.forcefield import GNNForceField
    from gamd_tpu.train.state import build_model, create_train_state

    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    system = get_preset("lj", skin=0.5, nbr_capacity=64)
    model_cfg = lj_model_config(compute_dtype=dtype)
    state = create_train_state(build_model(model_cfg, system), system,
                               TrainConfig(), 1, rng=jax.random.PRNGKey(0))
    ff = GNNForceField(state, system, model_cfg)

    box, pos0 = lj.lj_fluid_box(system.n_atoms, 0.5)
    pos = jnp.asarray(pos0)
    idx, mask, _ = dense_neighbor_list(pos, system.box,
                                       system.cutoff + system.skin,
                                       system.nbr_capacity)
    print(f"LJ-258, K={system.nbr_capacity}, dtype={dtype}")

    # 1. trivial op floor
    timed_scan(lambda x: x * 1.000001, pos, label="trivial (x*c)")

    # 2. BAOAB integrator with constant force
    from gamd_tpu.core import units
    from gamd_tpu.md.integrators import baoab_langevin
    masses = jnp.asarray(system.atom_masses())
    f0 = jnp.zeros_like(pos)
    init, step = baoab_langevin(lambda p: f0, units.FS * 2, masses, 100.0,
                                2.5)
    st = init(pos, jnp.zeros_like(pos), jax.random.PRNGKey(0))
    timed_scan(step, st, label="BAOAB only (const force)")

    # 3. mask refresh
    timed_scan(lambda p: p + 0.0 * refresh_mask(
        p, system.box, system.cutoff, idx, mask)[:, :1].astype(p.dtype),
        pos, label="mask refresh")

    # 4. edge features (geometry + rbf)
    def edge_feat(p):
        unit, dist = edge_geometry(p[None], idx[None], system.box)
        feats = jnp.concatenate([unit, dist[..., None],
                                 rbf_expand(dist)], -1)
        return p + 0.0 * feats[0, :, 0, :3]
    timed_scan(edge_feat, pos, label="edge features")

    # 5. full GNN force eval
    force = ff.force_fn()
    def force_step(p):
        return p + 1e-9 * force(p, idx, mask)
    timed_scan(force_step, pos, label="full GNN force")

    # 6. full MD step via Simulation body
    from gamd_tpu.core.config import MDConfig
    from gamd_tpu.md.simulate import Simulation
    md = MDConfig(integrator="langevin", temperature=100.0,
                  rebuild_every=20)
    sim = Simulation(force, system, md)
    st2 = sim.init_state(pos, rng=jax.random.PRNGKey(1))
    n = 2000
    r = sim.run(st2, n)
    jax.block_until_ready(r.state.pos)
    t0 = time.perf_counter()
    for _ in range(3):
        r = sim.run(st2, n)
        jax.block_until_ready(r.state.pos)
    dt = (time.perf_counter() - t0) / 3
    print(f"{'full MD step (incl rebuilds)':42s} {dt/n*1e6:9.1f} us/step   "
          f"({n/dt:,.0f} steps/s)")


if __name__ == "__main__":
    main()
