"""Pair-distance-resolved projection profiles (RDF-gate diagnostics).

Given per-atom 3-vectors v_i (force errors, forces, ...) on a set of
frames, estimate the mean projection onto pair directions as a function
of pair distance:

    P(r) = E[ v_i . rhat_ij  |  |r_ij| = r ],   rhat_ij = (p_i - p_j)/r

i.e. the radial component of v_i attributed to the pair (i, j), averaged
over all ordered pairs in a distance bin. For v = per-atom force error of
a model whose error decomposes pairwise, e_i = sum_k df(r_ik) rhat_ik,
the cross terms (k != j) average toward zero in an isotropic fluid and
P(r) estimates the effective pair-force bias df(r). Applying the same
estimator to the ground-truth forces recovers the analytic pair force
plus the cross-term contamination — the calibration channel.

ATTENUATION: the estimate is shape-faithful but multiplicatively
attenuated. Conditioned on pair (i, j), atom i's other neighbors are NOT
isotropic — excluded volume and g(r) structure around j remove neighbors
in j's direction — so the cross terms subtract a fraction of df itself.
Measured ~0.7x on a minimum-separation ideal gas (tests/test_pair_bias);
denser liquids attenuate more. Read P(r) as sign/shape/location of the
bias and a LOWER BOUND on its amplitude.

Numpy host code (diagnostic tooling, not a training/MD hot path). No
reference counterpart; supports the RDF analysis whose protocol mirrors
/root/reference/code/LJ/test_script/test_langevin.py.
"""

import numpy as np

__all__ = ["pair_projection_profile"]


def pair_projection_profile(pos, vec, box, edges, r_min=0.0):
    """Accumulate mean pair-direction projections binned by pair distance.

    Args:
        pos: [M, N, 3] frame positions (angstrom; any wrapping).
        vec: [M, N, 3] per-atom vectors to project (e.g. force errors).
        box: cubic box edge (angstrom), minimum-image convention.
        edges: [B+1] monotonically increasing distance bin edges.
        r_min: pairs closer than this are skipped (in addition to edges[0]).

    Returns:
        (profile, count): [B] mean projection per bin (0 where empty) and
        [B] ordered-pair sample counts.
    """
    pos = np.asarray(pos, np.float64)
    vec = np.asarray(vec, np.float64)
    if pos.ndim == 2:
        pos, vec = pos[None], vec[None]
    edges = np.asarray(edges, np.float64)
    n_bins = len(edges) - 1
    lo = max(float(edges[0]), r_min)
    hi = float(edges[-1])
    sums = np.zeros(n_bins)
    cnt = np.zeros(n_bins, dtype=np.int64)
    for f in range(pos.shape[0]):
        p = np.mod(pos[f], box)
        dr = p[None, :, :] - p[:, None, :]          # dr[i, j] = p_j - p_i
        dr -= box * np.round(dr / box)
        r = np.linalg.norm(dr, axis=-1)
        np.fill_diagonal(r, np.inf)
        ii, jj = np.where((r >= lo) & (r < hi))
        rhat = -dr[ii, jj] / r[ii, jj, None]        # unit vector j -> i
        proj = np.einsum("pd,pd->p", vec[f][ii], rhat)
        b = np.clip(np.digitize(r[ii, jj], edges) - 1, 0, n_bins - 1)
        sums += np.bincount(b, weights=proj, minlength=n_bins)
        cnt += np.bincount(b, minlength=n_bins)
    return sums / np.maximum(cnt, 1), cnt
