#!/usr/bin/env python
"""Offline force-accuracy evaluation on the held-out test split.

Produces the metrics the reference computes in its analysis notebooks
(reference: /root/reference/code/LJ/test_script/lj.ipynb cell 3,
/root/reference/code/water/test_script/post-analysis.ipynb cells 2-19):
force cosine similarity, MAE, RMSE, per-sample std, relative MAE (normalized
by the mean ground-truth force norm), and outlier ratio — in eV/A after the
same unit conversions (kJ/mol/nm x 0.0010364; Hartree/bohr x 27/0.52917).

Example:
    python scripts/evaluate.py --system lj --ckpt model_ckpt/checkpoint_29.msgpack \
        --data_dir ./md_dataset/lj_data
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--system", default="lj",
                        choices=["lj", "tip3p", "tip4p", "dft"])
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data_dir", required=True)
    # Architecture fallbacks for LEGACY checkpoints only: envelope
    # checkpoints (round 2+) embed their ModelConfig/SystemConfig and
    # ignore these flags.
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
    parser.add_argument("--max_frames", default=None, type=int)
    parser.add_argument("--sample_num", default=1000, type=int)
    parser.add_argument("--seed_num", default=10, type=int)
    parser.add_argument("--json_out", default=None)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the axon TPU plugin "
                             "ignores JAX_PLATFORMS)")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np

    from gamd_tpu.core import units
    from gamd_tpu.core.config import ModelConfig, get_preset
    from gamd_tpu.train.checkpoint import load_self_describing
    from gamd_tpu.train.data import RealLargeDataset, TrajectoryDataset
    from gamd_tpu.train.forcefield import GNNForceField

    fallback_cfg = ModelConfig(
        encoding_size=args.encoding_size, hidden_dim=args.hidden_dim,
        edge_embedding_dim=args.edge_embedding_dim,
        conv_layers=args.conv_layer, use_layer_norm=args.use_layer_norm,
        flip_dir=(args.system == "dft"))
    state, model_cfg, system = load_self_describing(
        args.ckpt, fallback_model_cfg=fallback_cfg,
        fallback_system=get_preset(args.system),
        use_pallas=args.use_pallas)
    ff = GNNForceField(state, system, model_cfg)

    if args.system == "dft":
        ds = RealLargeDataset(args.data_dir, mode="test")
        to_ev_a = units.HARTREE_TO_KJ_MOL / units.BOHR_TO_ANGSTROM \
            * units.KJ_MOL_NM_TO_EV_A * 10.0  # Ha/bohr -> eV/A
    else:
        ds = TrajectoryDataset(args.data_dir, mode="test",
                               data_type=args.system,
                               sample_num=args.sample_num,
                               seed_num=args.seed_num)
        to_ev_a = units.KJ_MOL_NM_TO_EV_A

    n = len(ds) if args.max_frames is None else min(len(ds), args.max_frames)
    items = [ds[i] for i in range(n)]
    gt = np.stack([it["forces"] for it in items]) * to_ev_a
    if args.system == "dft":
        # per-sample boxes -> per-frame prediction
        preds = [np.asarray(ff.predict(it["pos"], box=it.get("box_size")))
                 for it in items]
        pred = np.stack(preds) * to_ev_a
    else:
        pos_all = np.stack([it["pos"] for it in items])
        pred = np.asarray(ff.predict_batch(pos_all)) * to_ev_a

    flat_p = pred.reshape(-1, 3)
    flat_g = gt.reshape(-1, 3)
    cos = np.sum(flat_p * flat_g, axis=1) / (
        np.linalg.norm(flat_p, axis=1) * np.linalg.norm(flat_g, axis=1) + 1e-12)
    err = flat_p - flat_g
    mae = np.abs(err).mean()
    rmse = np.sqrt((err**2).mean())
    # Reference definition (lj.ipynb cell 3): MAE normalized by the mean
    # ground-truth force VECTOR NORM, not the mean |component| (the two
    # differ by ~2x for isotropic forces — E||f|| = 2 E|f_i| for Gaussian
    # components). Rounds 1-2 reported the component-denominator variant;
    # kept as relative_mae_component for continuity.
    rel_mae = mae / np.linalg.norm(flat_g, axis=1).mean()
    rel_mae_comp = mae / np.abs(flat_g).mean()
    ratio = np.abs(err.reshape(-1)) / (np.abs(flat_p.reshape(-1)) + 1e-8)
    # Cosine-gap diagnosis (round-4 VERDICT #3): slice cosine and MAE by
    # ground-truth force magnitude decile. A model whose MAE beats the
    # reference but whose mean cosine lags is making angular errors on
    # SMALL forces; the decile profile shows where.
    gnorm = np.linalg.norm(flat_g, axis=1)
    deciles = np.quantile(gnorm, np.linspace(0, 1, 11))
    cos_by_decile, mae_by_decile, edge_lo = [], [], []
    for d in range(10):
        lo, hi = deciles[d], deciles[d + 1]
        sel = (gnorm >= lo) & (gnorm <= hi if d == 9 else gnorm < hi)
        cos_by_decile.append(float(cos[sel].mean()))
        mae_by_decile.append(float(np.abs(err[sel]).mean()))
        edge_lo.append(float(lo))
    metrics = {
        "frames": int(n),
        "force_cosine_similarity": float(cos.mean()),
        "force_mae_ev_a": float(mae),
        "force_rmse_ev_a": float(rmse),
        "relative_mae": float(rel_mae),
        "relative_mae_component": float(rel_mae_comp),
        "outlier_ratio": float((ratio > 10.0).mean()),
        "per_sample_mae_std": float(
            np.abs(pred - gt).mean(axis=(1, 2)).std()),
        "cosine_by_gt_magnitude_decile": cos_by_decile,
        "mae_by_gt_magnitude_decile": mae_by_decile,
        "gt_magnitude_decile_edges_ev_a": edge_lo,
        "gt_force_norm_median_ev_a": float(np.median(gnorm)),
    }
    for k, v in metrics.items():
        print(f"{k}: {v}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
