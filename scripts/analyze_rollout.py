#!/usr/bin/env python
"""Physics validation of a GNN-driven rollout vs ground-truth data.

The TPU-native version of the reference's analysis notebooks
(reference: /root/reference/code/LJ/test_script/lj.ipynb cells 5-6 and
/root/reference/code/water/test_script/post-analysis.ipynb): runs an NVT
rollout with the trained force field, then compares the radial distribution
function and temperature statistics against the classical ground-truth
trajectory frames.

Example:
    python scripts/analyze_rollout.py --system lj \
        --ckpt model_ckpt/checkpoint_29.msgpack --data_dir md_dataset/lj_data \
        --steps 10000 --json_out rdf_report.json
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--system", default="lj", choices=["lj", "tip3p",
                                                           "tip4p"])
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data_dir", required=True,
                        help="ground-truth data_{seed}_{t}.npz directory")
    parser.add_argument("--steps", default=10000, type=int)
    parser.add_argument("--integrator", default="nose_hoover")
    parser.add_argument("--friction", default=None, type=float,
                        help="Langevin collision rate (1/ps). Default: the "
                             "system preset's GENERATION value; the "
                             "reference's rollout scripts use 25/ps for "
                             "both LJ and water (test_langevin.py:45)")
    parser.add_argument("--equil_fraction", default=0.3, type=float)
    parser.add_argument("--n_bins", default=100, type=int)
    parser.add_argument("--max_gt_frames", default=200, type=int)
    parser.add_argument("--gt_max_seed", default=9, type=int,
                        help="highest trajectory seed counted as ground "
                             "truth (default 9: the canonical 10-seed "
                             "protocol; extra/distilled seeds are "
                             "train-only and must not enter the GT RDF)")
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
                        help="whole-model Pallas megakernel rollout")
    parser.add_argument("--megastep", action="store_true",
                        help="whole neighbor-reuse window per Pallas program"
                             " (langevin, unconstrained only)")
    parser.add_argument("--rigid", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="water: SETTLE-constrained rollout (reference "
                             "protocol)")
    parser.add_argument("--classical_baseline", action="store_true",
                        help="also run a classical rollout of the same "
                             "length from the same start (apples-to-apples "
                             "RDF oracle with identical sampling)")
    parser.add_argument("--electrostatics", default="ewald",
                        choices=["ewald", "dsf"],
                        help="water classical-baseline Coulomb treatment; "
                             "must match how the dataset was generated")
    parser.add_argument("--pe", action="store_true",
                        help="evaluate the CLASSICAL oracle's potential "
                             "energy along the GNN trajectory (and along "
                             "the classical baseline when enabled) — the "
                             "reference's PE time-series comparison "
                             "(lj.ipynb cells 5-6, where OpenMM computes "
                             "classical PE on the hacked simulation). "
                             "Writes a plot-ready TSV next to --json_out")
    parser.add_argument("--pe_out", default=None,
                        help="PE TSV path (default: <json_out>_pe.tsv)")
    parser.add_argument("--json_out", default=None)
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
    from gamd_tpu.md.simulate import Simulation
    from gamd_tpu.physics.rdf import radial_distribution, rdf_l2
    from gamd_tpu.train.checkpoint import load_self_describing
    from gamd_tpu.train.forcefield import GNNForceField

    fallback_cfg = ModelConfig(
        encoding_size=args.encoding_size, hidden_dim=args.hidden_dim,
        edge_embedding_dim=args.edge_embedding_dim,
        conv_layers=args.conv_layer, use_layer_norm=args.use_layer_norm)
    state, model_cfg, system = load_self_describing(
        args.ckpt, fallback_model_cfg=fallback_cfg,
        fallback_system=get_preset(args.system),
        use_pallas=args.use_pallas)
    ff = GNNForceField(state, system, model_cfg)

    constraint = None
    if args.system in ("tip3p", "tip4p") and args.rigid:
        from gamd_tpu.md.constraints import RigidWater
        constraint = RigidWater(system.n_atoms // 3, system.box)

    # Ground-truth frames: sample evenly across seeds and (equilibrated)
    # times — naive sorted()[:N] would take only seed 0's earliest frames,
    # which are pre-equilibration and decorrelate the RDF comparison.
    # Seeds above --gt_max_seed are EXCLUDED: datasets may carry extra
    # train-only trajectories past the canonical 10-seed protocol
    # (--extra_seeds, distill_rollout.py), and distilled trajectories are
    # GNN rollouts — including them would contaminate the ground-truth
    # RDF with the model's own structure.
    files = sorted(glob.glob(os.path.join(args.data_dir, "data_*.npz")))
    if not files:
        raise SystemExit(f"no frames in {args.data_dir}")

    def frame_seed(path):
        stem = os.path.basename(path)[:-4]          # data_{seed}_{t}
        return int(stem.split("_")[1])

    def frame_t(path):
        stem = os.path.basename(path)[:-4]          # data_{seed}_{t}
        return int(stem.split("_")[2])

    files = [f for f in files if frame_seed(f) <= args.gt_max_seed]
    if not files:
        raise SystemExit(f"no frames with seed <= {args.gt_max_seed} "
                         f"in {args.data_dir}")
    equilibrated = [f for f in files if frame_t(f) >= 200] or files
    sel = np.round(np.linspace(0, len(equilibrated) - 1,
                               min(args.max_gt_frames,
                                   len(equilibrated)))).astype(int)
    files = [equilibrated[i] for i in sel]
    gt_frames = []
    for f in files[:args.max_gt_frames]:
        with np.load(f) as z:
            pos = z["pos"].astype(np.float32)
            if args.system == "tip4p":
                pos = pos[np.mod(np.arange(pos.shape[0]), 4) < 3]
            gt_frames.append(pos)
    gt_frames = np.stack(gt_frames)

    # GNN rollout from the last ground-truth frame.
    md = MDConfig(integrator=args.integrator, n_steps=args.steps,
                  temperature=system.temperature, dt_fs=system.dt_fs,
                  friction_per_ps=args.friction or system.friction_per_ps,
                  rebuild_every=20)
    megastep_fn = None
    if args.megastep:
        if args.integrator != "langevin" or constraint is not None:
            parser.error("--megastep requires langevin and an unconstrained "
                         "system")
        if args.cpu:
            print("WARNING: --megastep --cpu runs the interpret-mode kernel, "
                  "whose murmur3-hash Gaussian stream is test-quality "
                  "randomness only — do not use for production rollouts")
        megastep_fn = ff.megastep_fn(interpret=args.cpu)
    sim = Simulation(
        ff.force_fn(megakernel=args.megakernel or args.megastep,
                    interpret=args.cpu),
        system, md, constraint=constraint, megastep_fn=megastep_fn)
    start_pos = jnp.asarray(gt_frames[-1])
    if constraint is not None:
        start_pos = constraint.project_initial(start_pos)
    st = sim.init_state(start_pos, rng=jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    result = sim.run_segmented(st, args.steps)
    jax.block_until_ready(result.state.pos)
    rollout_s = time.perf_counter() - t0
    print(f"GNN rollout: {args.steps} steps in {rollout_s:.1f} s "
          f"({args.steps / rollout_s:.1f} steps/s incl. compile; "
          f"integrator={args.integrator}, rigid={constraint is not None})")
    if bool(result.overflow):
        print("WARNING: neighbor overflow during rollout")

    frames = np.asarray(result.positions)
    n_equil = int(len(frames) * args.equil_fraction)
    frames = frames[n_equil:]

    species = None
    if args.system in ("tip3p", "tip4p"):
        species = np.arange(system.n_atoms) % 3 == 0     # O-O RDF

    r, g_gnn = radial_distribution(frames, system.box, n_bins=args.n_bins,
                                   species_a=species, species_b=species)
    _, g_gt = radial_distribution(gt_frames, system.box, n_bins=args.n_bins,
                                  species_a=species, species_b=species)
    extra = {}
    if args.classical_baseline:
        if args.system == "lj":
            from gamd_tpu.physics import lennard_jones as lj
            cl_force = lj.lj_force_fn(system.box)
        else:
            from gamd_tpu.physics import water as w
            if args.system == "tip3p":
                cl_force = w.tip3p_force_fn(system.box, rigid=args.rigid,
                                            electrostatics=args.electrostatics)
            else:
                cl_force = w.tip4pew_force_fn(system.box, rigid=args.rigid,
                                              electrostatics=args.electrostatics)
        sim_cl = Simulation(cl_force, system, md, constraint=constraint)
        st_cl = sim_cl.init_state(start_pos, rng=jax.random.PRNGKey(1))
        res_cl = sim_cl.run_segmented(st_cl, args.steps)
        frames_cl = np.asarray(res_cl.positions)[n_equil:]
        _, g_cl = radial_distribution(frames_cl, system.box,
                                      n_bins=args.n_bins,
                                      species_a=species, species_b=species)
        extra = {
            "rdf_l2_vs_classical_rollout": rdf_l2(g_gnn, g_cl),
            "rdf_peak_classical_rollout": float(g_cl.max()),
            "classical_temperature_mean": float(np.asarray(
                res_cl.thermo.temperature)[args.steps // 2:].mean()),
        }

    # Transport: self-diffusion from the MSD linear regime. RDF alone can
    # look right while the force field transports wrongly; the classical
    # rollout under the identical protocol is the oracle.
    from gamd_tpu.physics.rdf import (diffusion_coefficient,
                                      mean_squared_displacement)
    dt_sample_ps = md.rebuild_every * md.dt_fs * 1e-3
    if frames.shape[0] >= 20:
        t_ps, msd = mean_squared_displacement(
            frames, system.box, dt_sample_ps, species=species)
        extra["diffusion_m2_s"] = diffusion_coefficient(t_ps, msd)
        if args.classical_baseline and frames_cl.shape[0] >= 20:
            t_cl, msd_cl = mean_squared_displacement(
                frames_cl, system.box, dt_sample_ps, species=species)
            extra["classical_diffusion_m2_s"] = diffusion_coefficient(
                t_cl, msd_cl)

    if args.pe:
        # Classical-oracle PE along the GNN trajectory: the reference plots
        # OpenMM's PE of the hacked (GNN-forced) simulation against the
        # classical log (lj.ipynb cells 5-6; enabled by test_langevin.py:79-83
        # reporting PE on the hacked Simulation object). Here the first-party
        # potentials play the oracle role. A correct GNN rollout samples the
        # same PE distribution as the classical run; a drifting/heating one
        # shows up immediately as a PE offset or trend.
        if args.system == "lj":
            from gamd_tpu.physics import lennard_jones as lj

            def pe_fn(p):
                return lj.lj_energy_dense(p, system.box)
        elif args.system == "tip3p":
            from gamd_tpu.physics import ewald as _ewald
            from gamd_tpu.physics import water as w
            if args.electrostatics == "ewald":
                _ew = _ewald.make_ewald_params(system.box)

                def pe_fn(p):
                    return w.tip3p_energy_rigid_ewald(p, system.box, _ew)
            else:
                def pe_fn(p):
                    return w.tip3p_energy_rigid(p, system.box)
        else:
            from gamd_tpu.physics import ewald as _ewald
            from gamd_tpu.physics import water as w
            if args.electrostatics == "ewald":
                _ew = _ewald.make_ewald_params(system.box)

                def pe_fn(p):
                    return w.tip4pew_energy_rigid_ewald(p, system.box, _ew)
            else:
                def pe_fn(p):
                    return w.tip4pew_energy_rigid(p, system.box)

        @jax.jit
        def pe_series(frames_dev):
            def body(_, p):
                with jax.default_matmul_precision("highest"):
                    return None, pe_fn(p)
            return jax.lax.scan(body, None, frames_dev)[1]

        pe_gnn = np.asarray(pe_series(jnp.asarray(frames)))
        pe_cl = None
        if args.classical_baseline:
            pe_cl = np.asarray(pe_series(jnp.asarray(frames_cl)))
        sample_ps = md.rebuild_every * md.dt_fs * 1e-3
        pe_path = args.pe_out or ((args.json_out or "rollout") + "_pe.tsv")
        with open(pe_path, "w") as f:
            cols = ['#"Frame"', '"Time (ps)"',
                    '"Classical PE on GNN traj (kJ/mole)"']
            if pe_cl is not None:
                cols.append('"Classical PE on classical traj (kJ/mole)"')
            f.write("\t".join(cols) + "\n")
            for i in range(len(pe_gnn)):
                row = [str(i), f"{(n_equil + i) * sample_ps:.4f}",
                       f"{pe_gnn[i]:.4f}"]
                if pe_cl is not None and i < len(pe_cl):
                    row.append(f"{pe_cl[i]:.4f}")
                f.write("\t".join(row) + "\n")
        print(f"PE series written to {pe_path}")
        extra["pe_gnn_mean_kj_mol"] = float(pe_gnn.mean())
        extra["pe_gnn_std_kj_mol"] = float(pe_gnn.std())
        # Linear PE trend over the analyzed window (heating/cooling drift).
        tt = np.arange(len(pe_gnn)) * sample_ps
        extra["pe_gnn_drift_kj_mol_ps"] = float(
            np.polyfit(tt, pe_gnn, 1)[0]) if len(pe_gnn) > 2 else 0.0
        if pe_cl is not None:
            extra["pe_classical_mean_kj_mol"] = float(pe_cl.mean())
            extra["pe_classical_std_kj_mol"] = float(pe_cl.std())

    temps = np.asarray(result.thermo.temperature)
    report = {
        **extra,
        "rdf_l2": rdf_l2(g_gnn, g_gt),
        "rdf_peak_gnn": float(g_gnn.max()),
        "rdf_peak_gt": float(g_gt.max()),
        "rdf_peak_pos_gnn": float(r[g_gnn.argmax()]),
        "rdf_peak_pos_gt": float(r[g_gt.argmax()]),
        "temperature_mean": float(temps[len(temps) // 2:].mean()),
        "temperature_target": system.temperature,
        "n_rollout_frames": int(frames.shape[0]),
        "n_gt_frames": int(gt_frames.shape[0]),
        "steps": args.steps,
        "rollout_steps_per_s_incl_compile": float(args.steps / rollout_s),
    }
    for k, v in report.items():
        print(f"{k}: {v}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({**report, "r": r.tolist(), "g_gnn": g_gnn.tolist(),
                       "g_gt": g_gt.tolist()}, f)


if __name__ == "__main__":
    main()
