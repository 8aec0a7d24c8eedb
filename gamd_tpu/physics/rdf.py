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
