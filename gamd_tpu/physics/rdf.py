"""Radial distribution function g(r) for periodic systems.

The GAMD paper's headline physics metric is RDF agreement between GNN-driven
MD and classical ground truth (no RDF code exists in the reference repo
itself; BASELINE.md sets "RDF vs OpenMM within statistical noise" as the
target). Histogramming is a dense pair computation, fully jittable.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gamd_tpu.core import space


def radial_distribution(frames, box, r_max=None, n_bins=100,
                        species_a=None, species_b=None):
    """g(r) averaged over trajectory frames.

    Args:
        frames: [T, N, 3] positions.
        box: cubic box edge.
        r_max: histogram range (default box/2).
        n_bins: number of radial bins.
        species_a, species_b: optional boolean masks [N] selecting the two
            species (e.g. O-O RDF for water); defaults to all-all.

    Returns:
        (r_centers [n_bins], g [n_bins]) numpy arrays.
    """
    frames = jnp.asarray(frames)
    t, n, _ = frames.shape
    if r_max is None:
        r_max = float(box) / 2.0
    edges = jnp.linspace(0.0, r_max, n_bins + 1)

    sel_a = jnp.ones(n, bool) if species_a is None else jnp.asarray(species_a)
    sel_b = jnp.ones(n, bool) if species_b is None else jnp.asarray(species_b)
    pair_mask = sel_a[:, None] & sel_b[None, :] & ~jnp.eye(n, dtype=bool)
    n_a = jnp.sum(sel_a)
    n_b = jnp.sum(sel_b)

    @jax.jit
    def frame_hist(pos):
        d2 = space.pairwise_distance2(pos, box)
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        d = jnp.where(pair_mask, d, 2.0 * r_max)   # drop excluded pairs
        hist, _ = jnp.histogram(d.reshape(-1), bins=edges)
        return hist

    counts = np.zeros(n_bins, np.float64)
    for i in range(t):
        counts += np.asarray(frame_hist(frames[i]), np.float64)
    counts /= t

    # Ideal-gas normalization: n_a * n_b / V pairs per shell volume.
    r_edges = np.asarray(edges, np.float64)
    shell_vol = 4.0 / 3.0 * np.pi * (r_edges[1:] ** 3 - r_edges[:-1] ** 3)
    volume = float(box) ** 3
    ideal = shell_vol * float(n_a) * float(n_b) / volume
    g = np.where(ideal > 0, counts / ideal, 0.0)
    r_centers = 0.5 * (r_edges[1:] + r_edges[:-1])
    return r_centers, g


def rdf_l2(g1, g2):
    """L2 distance between two RDF curves (the BASELINE comparison metric)."""
    g1 = np.asarray(g1)
    g2 = np.asarray(g2)
    return float(np.sqrt(np.mean((g1 - g2) ** 2)))


def unwrap_trajectory(frames, box):
    """Remove periodic wrapping from a sampled trajectory.

    Valid when no atom moves more than box/2 between consecutive samples
    (true for MD sampled every O(10-100) steps): each inter-frame
    displacement is taken min-image and accumulated.

    Args:
        frames: [T, N, 3] WRAPPED positions.
        box: cubic box edge.

    Returns:
        [T, N, 3] continuous (unwrapped) positions, frame 0 unchanged.
    """
    frames = jnp.asarray(frames)
    steps = space.min_image(frames[1:] - frames[:-1], box)
    return jnp.concatenate(
        [frames[:1], frames[:1] + jnp.cumsum(steps, axis=0)])


def mean_squared_displacement(frames, box, dt_ps, species=None):
    """MSD(t) over a sampled trajectory (time-origin averaged).

    The deployment-quality metric the RDF cannot see: a GNN force field
    can hold the right structure while transporting wrongly. Classical
    TIP3P's self-diffusion (~5-6e-9 m^2/s) is the oracle for GNN water
    rollouts, as RDF's classical oracle is for structure.

    Args:
        frames: [T, N, 3] wrapped positions (angstrom), uniform sampling.
        box: cubic box edge.
        dt_ps: time between samples (ps).
        species: optional [N] bool mask (e.g. oxygens only).

    Returns:
        (t_ps [T-1], msd [T-1] in A^2) numpy arrays; msd[k-1] is the
        average over all origins of |r(t0 + k dt) - r(t0)|^2.
    """
    u = np.asarray(unwrap_trajectory(frames, box))
    if species is not None:
        u = u[:, np.asarray(species)]
    n_t = u.shape[0]
    lags = np.arange(1, n_t)
    msd = np.empty(n_t - 1)
    for k in lags:                       # numpy: one pass per lag
        d = u[k:] - u[:n_t - k]
        msd[k - 1] = (d * d).sum(-1).mean()
    return lags * dt_ps, msd


def diffusion_coefficient(t_ps, msd_a2, fit_lo_frac=0.1, fit_hi_frac=0.5):
    """Self-diffusion D from the linear MSD regime: MSD = 6 D t.

    Fits the [fit_lo_frac, fit_hi_frac] window of the lag range (skips the
    ballistic/cage short-time part; lags past ~half the trajectory average
    over too few time origins to be reliable).

    Returns D in m^2/s (inputs: ps, A^2).
    """
    n = len(t_ps)
    lo, hi = int(n * fit_lo_frac), max(int(n * fit_hi_frac), int(n * fit_lo_frac) + 2)
    slope = np.polyfit(t_ps[lo:hi], msd_a2[lo:hi], 1)[0]   # A^2 / ps
    return slope / 6.0 * 1e-20 / 1e-12
