#!/usr/bin/env python
"""Pair-distance-resolved force-bias analysis (LJ RDF-gate diagnosis).

The 25k-step GNN rollout over-structures the LJ fluid (first RDF peak
2.84 vs ground truth 2.50 at the same position, results/lj_rdf_r4.json)
even though the model's force MAE beats the reference. A uniform force
gain is ruled out (a >1% gain would exceed the measured MAE), so the
hypothesis is a DISTANCE-DEPENDENT bias: the model's effective pair
force deviates from LJ by some delta-f(r), which integrates into an
effective pair-potential bias that reshapes the RDF while staying tiny
in the frame-averaged MAE.

Method: on held-out test frames, project each atom's force ERROR onto
each of its pair directions and bin by pair distance:

    b(r) = E[ (F_pred_i - F_gt_i) . rhat_ij | |r_ij| = r ]

with rhat_ij the unit vector from j to i (so b > 0 = excess repulsion,
b < 0 = excess attraction). If the model error decomposes pairwise,
e_i = sum_k delta_f(r_ik) rhat_ik, then in an isotropic fluid the
cross terms (k != j) average toward zero and b(r) estimates
delta_f(r) to first order. The same projection applied to F_gt recovers
the analytic LJ pair force (printed as a sanity channel: gt_proj vs
f_lj), calibrating how much residual cross-term contamination the
estimator carries at this density. Integrating -b(r) inward from the
cutoff gives the effective pair-potential bias delta_u(r); a negative
well near the LJ minimum is extra cohesion = over-structuring.

No reference counterpart (the reference never diagnoses rollout RDF
error); the RDF protocol itself mirrors
/root/reference/code/LJ/test_script/test_langevin.py.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--max_frames", default=200, type=int)
    parser.add_argument("--n_bins", default=45, type=int)
    parser.add_argument("--r_min", default=3.0, type=float)
    parser.add_argument("--json_out", default=None)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np

    from gamd_tpu.core import units
    from gamd_tpu.core.config import ModelConfig, get_preset
    from gamd_tpu.physics.lennard_jones import LJParams
    from gamd_tpu.train.checkpoint import load_self_describing
    from gamd_tpu.train.data import TrajectoryDataset
    from gamd_tpu.train.forcefield import GNNForceField

    state, model_cfg, system = load_self_describing(
        args.ckpt, fallback_model_cfg=ModelConfig(),
        fallback_system=get_preset("lj"))
    ff = GNNForceField(state, system, model_cfg)
    box, cutoff = float(system.box), float(system.cutoff)

    ds = TrajectoryDataset(args.data_dir, mode="test", data_type="lj")
    n = min(len(ds), args.max_frames)
    items = [ds[i] for i in range(n)]
    to_ev_a = units.KJ_MOL_NM_TO_EV_A
    gt = np.stack([it["forces"] for it in items]) * to_ev_a      # [M,N,3]
    pos = np.stack([it["pos"] for it in items]).astype(np.float64)
    pred = np.asarray(ff.predict_batch(np.float32(pos))) * to_ev_a
    err = pred - gt

    from gamd_tpu.physics.pair_bias import pair_projection_profile

    edges = np.linspace(args.r_min, cutoff, args.n_bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    bias, cnt = pair_projection_profile(pos, err, box, edges)
    gt_proj, _ = pair_projection_profile(pos, gt, box, edges)
    # Analytic (shifted-potential) LJ pair force magnitude along rhat:
    # f(r) = 24 eps (2 (sigma/r)^12 - (sigma/r)^6) / r  [kJ/mol/A] -> eV/A
    lj = LJParams()
    s6 = (lj.sigma / centers) ** 6
    f_lj = 24.0 * lj.epsilon * (2 * s6 * s6 - s6) / centers * (
        units.KJ_MOL_NM_TO_EV_A * 10.0)
    # Effective pair-potential bias with du(cutoff) = 0: the bias force is
    # delta_f = -d(du)/dr, so du(r) = + integral_r^cutoff delta_f(s) ds (eV).
    w = np.diff(edges)
    du = np.cumsum((bias * w)[::-1])[::-1]
    out = {
        "frames": int(n),
        "r_bins_a": centers.tolist(),
        "pair_force_bias_ev_a": bias.tolist(),
        "pair_count": cnt.tolist(),
        "gt_pair_projection_ev_a": gt_proj.tolist(),
        "analytic_lj_pair_force_ev_a": f_lj.tolist(),
        "effective_pair_potential_bias_ev": du.tolist(),
        "du_at_min_ev": float(du[np.argmin(np.abs(centers - 3.816))]),
        "bias_rms_ev_a": float(np.sqrt((bias**2).mean())),
        "estimator_calibration_rms_ev_a": float(
            np.sqrt(((gt_proj - f_lj) ** 2).mean())),
    }
    for k in ("frames", "du_at_min_ev", "bias_rms_ev_a",
              "estimator_calibration_rms_ev_a"):
        print(f"{k}: {out[k]}")
    print("r(A)   bias(eV/A)   gt_proj     f_lj        du(eV)      count")
    for i in range(args.n_bins):
        print(f"{centers[i]:6.3f} {bias[i]:+.5e} {gt_proj[i]:+.5e} "
              f"{f_lj[i]:+.5e} {du[i]:+.5e} {cnt[i]}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
