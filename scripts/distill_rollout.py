#!/usr/bin/env python
"""On-policy rollout distillation (DAgger-style data augmentation).

Round-4 finding (RESULTS.md r4h): the LJ RDF over-structure tracks the
model's robustness OFF the training manifold — rollout states are states
the classical trajectories never visit, so the model's errors there are
unconstrained by the training set. The principled fix is to train where
the model actually goes: roll out the CURRENT GNN checkpoint, record
frames along its own trajectory, label them with the first-party
classical oracle, and append them as extra train-only trajectories
(consumed by ``train_gamd.py --extra_seeds``). The reference cannot do
this — it had no generator at train time (its ground truth came from an
external OpenMM run, reference: /root/reference/dataset/generate_lj_data.py).

Frames land as ``data_{seed}_{t}.npz`` (pos/vel/forces, dataset units) at
``--seed_start`` so the canonical 90/10 split and its held-out eval set
are untouched.

Example (two 1000-frame GNN-NHC trajectories labeled by the LJ oracle):
    python scripts/distill_rollout.py --system lj \
        --ckpt results/ckpts/lj_relabel_latest.msgpack \
        --out md_dataset/lj_data --seeds 2 --seed_start 20
    python scripts/train_gamd.py --system lj ... --extra_seeds 12
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--system", default="lj", choices=["lj", "tip3p"])
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", required=True,
                        help="dataset dir to write data_{seed}_{t}.npz into")
    parser.add_argument("--seeds", default=2, type=int,
                        help="number of GNN rollout trajectories")
    parser.add_argument("--seed_start", default=20, type=int,
                        help="first seed index (keep past the canonical "
                             "seeds so --extra_seeds picks the frames up)")
    parser.add_argument("--frames", default=1000, type=int)
    parser.add_argument("--interval", default=50, type=int,
                        help="MD steps between recorded frames")
    parser.add_argument("--integrator", default=None,
                        choices=[None, "langevin", "nose_hoover"],
                        help="default: nose_hoover (lj) / langevin (tip3p)")
    parser.add_argument("--friction", default=None, type=float)
    parser.add_argument("--thermalize", default=2000, type=int,
                        help="equilibration steps before recording")
    parser.add_argument("--dispatch_frames", default=50, type=int)
    parser.add_argument("--no_rigid", dest="rigid", default=True,
                        action="store_false")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from gamd_tpu.core.config import MDConfig, get_preset
    from gamd_tpu.md.simulate import Simulation
    from gamd_tpu.physics.generate import (_record_seeds_batched,
                                           _stack_states)
    from gamd_tpu.physics.minimize import fire_minimize
    from gamd_tpu.train.checkpoint import load_self_describing
    from gamd_tpu.train.forcefield import GNNForceField

    state, model_cfg, system = load_self_describing(
        args.ckpt, fallback_system=get_preset(args.system))
    ff = GNNForceField(state, system, model_cfg)
    print(f"Loaded {args.ckpt} (longrange={model_cfg.longrange!r})")

    constraint = None
    if args.system == "tip3p" and args.rigid:
        from gamd_tpu.md.constraints import RigidWater
        constraint = RigidWater(system.n_atoms // 3, system.box)

    integ = args.integrator or ("nose_hoover" if args.system == "lj"
                                else "langevin")
    md = MDConfig(integrator=integ, temperature=system.temperature,
                  dt_fs=system.dt_fs,
                  friction_per_ps=args.friction or system.friction_per_ps,
                  rebuild_every=10)
    sim = Simulation(ff.force_fn(interpret=args.cpu and model_cfg.use_pallas),
                     system, md, constraint=constraint)

    # Classical oracle for the labels + a classical init (same recipe as
    # generation/run_md: lattice -> FIRE minimize -> [project]).
    if args.system == "lj":
        from gamd_tpu.physics import lennard_jones as lj
        params = lj.LJParams()
        gen_box, base_pos = lj.lj_fluid_box(system.n_atoms, 0.5, params)
        record_force = jax.jit(
            lambda p: lj.lj_forces_dense(p, gen_box, params))
        minimize_force = record_force
        def init_pos(seed):
            return jnp.asarray(base_pos)
    else:
        from gamd_tpu.physics import ewald as _ewald
        from gamd_tpu.physics import water as w
        params = w.TIP3PParams()
        box = system.box
        ew = _ewald.make_ewald_params(box)
        rec_energy = (w.tip3p_energy_rigid_ewald if args.rigid
                      else w.tip3p_energy_ewald)
        record_force = jax.jit(
            lambda p: -jax.grad(rec_energy)(p, box, ew, params))
        minimize_force = jax.jit(
            lambda p: -jax.grad(w.tip3p_energy_ewald)(p, box, ew, params))
        def init_pos(seed):
            return jnp.asarray(
                w.water_box(system.n_atoms // 3, box, params, seed=seed))

    os.makedirs(args.out, exist_ok=True)
    # All seeds advance in lockstep through ONE vmapped device program per
    # frame block (the generator's batched path: R small systems cost ~the
    # wall time of one on a TPU core).
    seeds = list(range(args.seed_start, args.seed_start + args.seeds))
    states = []
    for seed in seeds:
        pos = init_pos(seed)
        # Decorrelate identical lattice starts (LJ) before minimizing.
        pos = pos + 0.02 * jax.random.normal(jax.random.PRNGKey(seed),
                                             pos.shape)
        pos, _ = fire_minimize(minimize_force, pos, n_steps=1000,
                               max_step=0.05)
        if constraint is not None:
            pos = constraint.project_initial(pos)
        states.append(sim.init_state(pos, rng=jax.random.PRNGKey(3000 + seed)))
    states = _stack_states(states)
    if args.thermalize:
        states = jax.jit(jax.vmap(
            lambda st: sim.run(st, args.thermalize).state))(states)
    _record_seeds_batched(sim, states, args.out, seeds, args.frames,
                          args.interval, record_force, args.dispatch_frames,
                          log_every_frames=args.dispatch_frames * 2)
    print(f"{args.seeds} x {args.frames} GNN-rollout frames "
          f"oracle-labeled -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
