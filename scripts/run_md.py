#!/usr/bin/env python
"""GNN-driven NVT molecular dynamics rollout (the reference's test_script/
rollout drivers, fused: reference /root/reference/code/LJ/test_script/
test_langevin.py and test_nosehoover.py become one CLI).

Example:
    python scripts/run_md.py --system lj --ckpt model_ckpt/checkpoint_29.msgpack \
        --integrator langevin --steps 25000 --log log_nvt_gnn_langevin_lj.txt
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--system", default="lj",
                        choices=["lj", "tip3p", "tip4p", "dft"])
    parser.add_argument("--n_atoms", default=None, type=int,
                        help="dft rollout: atoms in the fixed-volume water "
                             "box (default 774 — the reference's 2 nm box)")
    parser.add_argument("--ckpt", required=False, default=None,
                        help="TrainState msgpack checkpoint (untrained if omitted)")
    parser.add_argument("--init_pos", default=None,
                        help=".npy initial positions (angstrom); "
                             "default: minimized lattice/random box")
    parser.add_argument("--integrator", default="langevin",
                        choices=["langevin", "nose_hoover", "nve", "andersen"])
    parser.add_argument("--steps", default=25000, type=int)
    parser.add_argument("--temperature", default=None, type=float)
    parser.add_argument("--friction", default=None, type=float,
                        help="1/ps collision rate / NHC frequency")
    parser.add_argument("--dt", default=2.0, type=float, help="fs")
    parser.add_argument("--rebuild_every", default=20, type=int)
    parser.add_argument("--report_every", default=100, type=int)
    parser.add_argument("--log", default="log_nvt_gnn.txt")
    parser.add_argument("--out_traj", default=None,
                        help="optional .npy to save final positions")
    # Architecture fallbacks for LEGACY checkpoints (envelope checkpoints
    # embed their config and ignore these).
    parser.add_argument("--encoding_size", default=128, type=int)
    parser.add_argument("--hidden_dim", default=128, type=int)
    parser.add_argument("--edge_embedding_dim", default=128, type=int)
    parser.add_argument("--conv_layer", default=4, type=int)
    parser.add_argument("--use_layer_norm", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="legacy-checkpoint fallback: LayerNorm (default)"
                             " vs BatchNorm (--no-use_layer_norm)")
    parser.add_argument("--use_pallas", action="store_true",
                        help="fused Pallas kernels for the force model")
    parser.add_argument("--megakernel", action="store_true",
                        help="whole-model Pallas megakernel force path")
    parser.add_argument("--megastep", action="store_true",
                        help="whole neighbor-reuse window per Pallas program"
                             " (fastest path; langevin, unconstrained only)")
    parser.add_argument("--banded", action="store_true",
                        help="x-sorted banded-gather force path for large N "
                             "(ops/banded.py; fixed scalar box; uses the "
                             "cell-list neighbor search)")
    parser.add_argument("--k_model", default=None, type=int,
                        help="slice the distance-sorted neighbor list to "
                             "this K for the force model (overflow-guarded)")
    parser.add_argument("--rigid", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="water systems: SETTLE rigid-monomer rollout "
                             "(the reference protocol); --no-rigid for "
                             "unconstrained dynamics")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the axon TPU plugin "
                             "ignores JAX_PLATFORMS)")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from gamd_tpu.core.config import MDConfig, ModelConfig, get_preset
    from gamd_tpu.md.reporters import StateReporter
    from gamd_tpu.md.simulate import Simulation
    from gamd_tpu.physics import lennard_jones as lj
    from gamd_tpu.physics.minimize import fire_minimize
    from gamd_tpu.train.checkpoint import load_self_describing
    from gamd_tpu.train.forcefield import GNNForceField
    from gamd_tpu.train.state import build_model, create_train_state

    fallback_cfg = ModelConfig(
        encoding_size=args.encoding_size, hidden_dim=args.hidden_dim,
        edge_embedding_dim=args.edge_embedding_dim,
        conv_layers=args.conv_layer, use_layer_norm=args.use_layer_norm)
    if args.ckpt:
        state, model_cfg, system = load_self_describing(
            args.ckpt, fallback_model_cfg=fallback_cfg,
            fallback_system=get_preset(args.system),
            use_pallas=args.use_pallas)
        print(f"Loaded {args.ckpt}")
    else:
        from gamd_tpu.core.config import TrainConfig
        system = get_preset(args.system)
        model_cfg = fallback_cfg
        model = build_model(model_cfg, system)
        state = create_train_state(model, system, TrainConfig(), 1)
    force_closure = None
    if args.system == "dft":
        # Deployment parity with the reference's RPBE rollout
        # (reference: /root/reference/code/water/test_script/
        # test_langevin_hb.py:33-38,95,108): the dynamic-box model drives a
        # rigid water box at FIXED volume (2 nm edge), gamma=25/ps, dt=2fs,
        # 1e5 fs total. The model works in bohr end-to-end; the MD driver
        # stays in angstrom and the force closure converts positions (the
        # preset's force_unit_to_internal already lands Ha/bohr in
        # kJ/mol/A).
        import dataclasses

        from gamd_tpu.core import units as U

        n = args.n_atoms or 774
        box_a = 20.0
        model_system = dataclasses.replace(
            system, n_atoms=n, box=box_a / U.BOHR_TO_ANGSTROM)
        ff = GNNForceField(state, model_system, model_cfg)
        fn_bohr = ff.force_fn()
        a2b = 1.0 / U.BOHR_TO_ANGSTROM

        def force_closure(pos, idx, mask):
            return fn_bohr(pos * a2b, idx, mask)

        system = get_preset(
            "tip3p", n_atoms=n, box=box_a,
            cutoff=float(model_system.cutoff) * U.BOHR_TO_ANGSTROM,
            nbr_capacity=128, friction_per_ps=25.0)
    else:
        ff = GNNForceField(state, system, model_cfg)

    constraint = None
    if args.system in ("tip3p", "tip4p", "dft") and args.rigid:
        from gamd_tpu.md.constraints import RigidWater
        constraint = RigidWater(system.n_atoms // 3, system.box)

    # Initial positions.
    if args.init_pos:
        pos = np.load(args.init_pos).astype(np.float32)
    elif args.system == "lj":
        _, pos = lj.lj_fluid_box(system.n_atoms, 0.5)
        force = lambda p: lj.lj_forces_dense(p, system.box)
        pos, _ = fire_minimize(force, jnp.asarray(pos), n_steps=1000)
        pos = np.asarray(pos)
    else:
        from gamd_tpu.physics import water as w
        pos = w.water_box(system.n_atoms // 3, system.box, seed=args.seed)
        params_w = w.TIP3PParams(cutoff=min(9.0, system.box / 2 - 0.01))
        force = lambda p: w.tip3p_forces(p, system.box, params_w)
        pos, _ = fire_minimize(force, jnp.asarray(pos), n_steps=1500,
                               max_step=0.05)
        pos = np.asarray(pos)
    if constraint is not None:
        pos = np.asarray(constraint.project_initial(jnp.asarray(pos)))

    md = MDConfig(
        integrator=args.integrator, n_steps=args.steps,
        temperature=args.temperature or system.temperature,
        dt_fs=args.dt,
        friction_per_ps=args.friction or system.friction_per_ps,
        rebuild_every=args.rebuild_every, report_every=args.report_every,
        seed=args.seed)

    megastep_fn = None
    if args.megastep:
        if args.integrator != "langevin" or constraint is not None:
            parser.error("--megastep requires --integrator langevin and an "
                         "unconstrained system (use --no-rigid for water)")
        if args.cpu:
            print("WARNING: --megastep --cpu runs the interpret-mode kernel, "
                  "whose murmur3-hash Gaussian stream is test-quality "
                  "randomness only — do not use for production rollouts")
        megastep_fn = ff.megastep_fn(interpret=args.cpu)
    nbr_method = "dense"
    if args.banded:
        if args.megakernel or args.megastep:
            parser.error("--banded is an alternative force path to "
                         "--megakernel/--megastep")
        if force_closure is not None:
            parser.error("--banded does not support the dft deployment "
                         "closure")
        import dataclasses as _dc
        if system.nbr_capacity < 96:
            # Thermal LJ at rho*=0.5 peaks ~66 in-radius neighbors at the
            # preset skin — the preset's 64 saturates.
            system = _dc.replace(system, nbr_capacity=96)
        force_closure = ff.banded_force_fn(interpret=args.cpu)
        # Cell-list only where the box is >=4 cells wide (at small N the
        # 3-cell-wide box wraps neighbor shells and the searcher flags
        # overflow); dense top-K is the right searcher there anyway.
        nbr_method = "cell" if system.n_atoms > 1024 else "dense"
    if force_closure is None:
        force_closure = ff.force_fn(
            megakernel=args.megakernel or args.megastep,
            interpret=args.cpu)
    sim = Simulation(
        force_closure,
        system, md, constraint=constraint, k_model=args.k_model,
        megastep_fn=megastep_fn, nbr_method=nbr_method)
    st = sim.init_state(jnp.asarray(pos), rng=jax.random.PRNGKey(args.seed))

    print(f"Simulating {system.n_atoms} atoms, {args.steps} steps "
          f"({args.integrator}, T={md.temperature} K)")
    t0 = time.perf_counter()
    result = sim.run_segmented(st, args.steps)
    jax.block_until_ready(result.state.pos)
    wall = time.perf_counter() - t0
    print(f"{args.steps} steps in {wall:.2f} s "
          f"({args.steps / wall:.0f} steps/s, incl. compile)")
    if bool(result.overflow):
        print("WARNING: neighbor capacity overflow — increase nbr_capacity")

    StateReporter(args.log, report_interval=args.report_every,
                  dt_fs=args.dt).write(result.thermo)
    print(f"Thermo log: {args.log}")
    if args.out_traj:
        np.save(args.out_traj, np.asarray(result.state.pos))


if __name__ == "__main__":
    main()
