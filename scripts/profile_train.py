#!/usr/bin/env python
"""Bisection profile of the fused train step (where do 24.6 ms/step go?).

Times, per optimizer step at the chosen batch size:
  1. neighbor search alone (vmapped dense top-k)
  2. + rotation augmentation + jitter + scaler updates
  3. forward only
  4. forward + backward + adam (the full step, minus the epoch scan)
  5. the real epoch-scan step (steps amortized over a whole epoch program)

Run on the idle chip: python scripts/profile_train.py --system lj --batch 4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--system", default="lj")
    parser.add_argument("--batch", default=4, type=int)
    parser.add_argument("--reps", default=50, type=int)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--use_pallas", action="store_true",
                        help="route the conv-layer edge pipeline through "
                             "the fused Pallas kernels (forward + REAL "
                             "backward kernel) instead of plain XLA")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gamd_tpu.core.config import ModelConfig, TrainConfig, get_preset
    from gamd_tpu.train import augment
    from gamd_tpu.train.loop import (_edge_distances, _search_batch,
                                     make_train_step)
    from gamd_tpu.train.state import (build_model, create_train_state,
                                      make_optimizer)
    from gamd_tpu.models.normalizer import update_stat

    system = get_preset(args.system)
    b, n = args.batch, system.n_atoms
    model_cfg = ModelConfig(use_layer_norm=True,
                            use_pallas=args.use_pallas)
    train_cfg = TrainConfig(batch_size=b)
    model = build_model(model_cfg, system)
    tx = make_optimizer(train_cfg, 1000)
    state = create_train_state(model, system, train_cfg, 1000)

    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.uniform(0, system.box, (b, n, 3)), jnp.float32)
    forces = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
    feat = None
    if system.species == "water":
        feat = jnp.asarray(
            np.tile(system.species_onehot()[None], (b, 1, 1)))
    batch = {"pos": pos, "forces": forces}
    if feat is not None:
        batch["feat"] = feat

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
        jax.block_until_ready(out)
        ms = 1000 * (time.perf_counter() - t0) / args.reps
        print(f"{name}: {ms:.3f} ms", flush=True)

    search = jax.jit(lambda p: _search_batch(p, system.box, system.cutoff,
                                             system.nbr_capacity))
    timeit("1. neighbor search", search, pos)

    @jax.jit
    def pre(p, f, st):
        keys = jax.random.split(jax.random.PRNGKey(0), b)
        p2, f2, _ = jax.vmap(
            lambda k, pp, ff: augment.rotate_sample(k, pp, ff, system.box,
                                                    prob=0.3))(keys, p, f)
        idx, mask, ovf = _search_batch(p2, system.box, system.cutoff,
                                       system.nbr_capacity)
        p2 = augment.jitter_positions(jax.random.PRNGKey(1), p2, 0.005)
        dist = _edge_distances(p2, idx, system.box)
        ls = update_stat(st.length_stat, dist, mask=mask)
        fs = update_stat(st.force_stat, f2)
        return idx, mask, ls.safe_mean, fs.safe_mean
    timeit("2. aug + search + scalers", pre, pos, forces, state)

    idx, mask, _ = search(pos)
    bond = None
    if model.use_bond:
        from gamd_tpu.neighbors.topology import neighbor_bond_channel
        bond = jax.vmap(neighbor_bond_channel)(idx)

    @jax.jit
    def fwd(params, p):
        return model.apply({"params": params} if not state.batch_stats else
                           {"params": params,
                            "batch_stats": state.batch_stats},
                           p, idx, mask, system.box, 0.5, 2.0,
                           node_feat=feat, bond=bond, train=False)
    timeit("3. forward only", fwd, state.params, pos)

    step = make_train_step(model, system, train_cfg, tx)
    timeit("4. full train step", step, state, batch)


if __name__ == "__main__":
    main()
