"""Tests for the pair-projection bias estimator (physics/pair_bias.py).

The estimator must recover a KNOWN planted pair-force bias from per-atom
vector sums: build random liquid-like configurations, synthesize
e_i = sum_j df(r_ij) rhat_ij with an analytic df, and check the binned
projection profile matches df(r) to within the cross-term noise floor.
"""

import numpy as np
import pytest

from gamd_tpu.physics.pair_bias import pair_projection_profile


def _synth_frames(n_frames, n_atoms, box, seed, min_sep=2.6):
    """Random configurations with a hard minimum separation (Poisson-disk
    via rejection), so the planted df(r) is probed only at liquid-like
    distances."""
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n_frames):
        pts = [rng.uniform(0, box, 3)]
        while len(pts) < n_atoms:
            cand = rng.uniform(0, box, 3)
            d = np.array(pts) - cand
            d -= box * np.round(d / box)
            if (np.linalg.norm(d, axis=1) > min_sep).all():
                pts.append(cand)
        frames.append(np.array(pts))
    return np.stack(frames)


def _pair_vec_sum(pos, box, df, r_max):
    """e_i = sum_j df(|r_ij|) rhat_ij for pairs within r_max."""
    out = np.zeros_like(pos)
    for f in range(pos.shape[0]):
        p = pos[f]
        dr = p[None, :, :] - p[:, None, :]      # dr[i, j] = p_j - p_i
        dr -= box * np.round(dr / box)
        r = np.linalg.norm(dr, axis=-1)
        np.fill_diagonal(r, np.inf)
        r_safe = np.minimum(r, 2.0 * r_max)
        w = np.where(r < r_max, df(r_safe) / r_safe, 0.0)
        out[f] = -(w[:, :, None] * dr).sum(axis=1)   # rhat_ij = -dr/r
    return out


def test_recovers_planted_pair_bias():
    box, r_max = 18.0, 7.5
    pos = _synth_frames(n_frames=40, n_atoms=60, box=box, seed=0)

    def df(r):
        return 1e-3 * np.sin(2.0 * np.pi * (r - 3.0) / 4.5)

    vec = _pair_vec_sum(pos, box, df, r_max)
    edges = np.linspace(3.0, r_max, 10)
    prof, cnt = pair_projection_profile(pos, vec, box, edges)
    centers = 0.5 * (edges[:-1] + edges[1:])
    assert (cnt > 200).all()
    # The estimator is ATTENUATED by excluded-volume anisotropy of the
    # conditioned neighbor field, and the attenuation is itself mildly
    # r-dependent (module docstring). Require (a) a physically sensible
    # fitted gain, (b) strong shape correlation, (c) residual after the
    # scalar fit bounded at 20% of peak amplitude.
    target = df(centers)
    gain = float(prof @ target / (target @ target))
    assert 0.5 < gain < 1.1
    corr = np.corrcoef(prof, target)[0, 1]
    assert corr > 0.97
    assert np.abs(prof - gain * target).max() < 0.20 * 1e-3


def test_sign_convention_repulsive_pair():
    # Two atoms, vector on each pointing AWAY from the other =>
    # positive (repulsive) projection.
    box = 20.0
    pos = np.array([[[5.0, 5.0, 5.0], [9.0, 5.0, 5.0]]])
    vec = np.array([[[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    edges = np.array([3.0, 5.0])
    prof, cnt = pair_projection_profile(pos, vec, box, edges)
    assert cnt[0] == 2
    assert prof[0] == pytest.approx(1.0)


def test_minimum_image_distance():
    # Pair separated across the periodic boundary: true distance 4, not 16.
    box = 20.0
    pos = np.array([[[1.0, 0.0, 0.0], [17.0, 0.0, 0.0]]])
    vec = np.array([[[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    edges = np.array([3.0, 5.0])
    prof, cnt = pair_projection_profile(pos, vec, box, edges)
    assert cnt[0] == 2
    # Across the boundary, atom 0's outward direction is +x.
    assert prof[0] == pytest.approx(-1.0)
