"""Dense O(N^2) neighbor search producing fixed-capacity padded lists.

TPU-first replacement for BOTH of the reference's neighbor paths:

  * the jax-md cell list it wraps for training/inference
    (reference: /root/reference/code/graph_utils.py:11-44), and
  * the O(N^2) dense fallback used by the dynamic-box model
    (reference: /root/reference/code/md_module.py:93-126).

Design: TPUs want static shapes, so instead of a dynamic [2, E] edge list we
return a padded [N, K] neighbor-index array plus a validity mask. Row i holds
up to K neighbors of center atom i; the padded slots point at atom i itself
(self-reference) so downstream gathers are always in-bounds, and the mask
zeroes their contribution. For the system sizes the reference covers
(N <= 774) the dense [N, N] distance matrix is a trivial, perfectly regular
VPU workload and beats any cell list; the cell list in
``gamd_tpu.neighbors.cell_list`` takes over for large N.

Neighbors are selected by smallest distance (top-K), so when a row overflows
capacity the *farthest* neighbors are dropped — and the overflow flag reports
it, mirroring jax-md's did_buffer_overflow recovery contract
(reference: /root/reference/code/graph_utils.py:41-43).
"""

from functools import partial

import jax
import jax.numpy as jnp

from gamd_tpu.core import space


@partial(jax.jit, static_argnames=("k_max", "include_self"))
def dense_neighbor_list(pos, box, cutoff, k_max, include_self=False):
    """Build a padded [N, K] neighbor list from all-pairs distances.

    Args:
        pos: [N, 3] positions (any image; min-image convention applied).
        box: scalar or [3] box edge length(s); may be traced.
        cutoff: scalar search radius (build with cutoff+skin for reuse);
            may be traced.
        k_max: static neighbor capacity K.
        include_self: keep i==j pairs (off by default; the reference's
            add_self_loop is a silent no-op so self edges are absent,
            reference: /root/reference/code/nn_module.py:652).

    Returns:
        idx:      [N, K] int32 neighbor ids; padded slots hold the row index.
        mask:     [N, K] bool validity.
        overflow: scalar bool — some row had more than K in-range neighbors.
    """
    n = pos.shape[0]
    d2 = space.pairwise_distance2(pos, box)        # [N, N], d2[i, j] = |r_ij|^2
    eye = jnp.eye(n, dtype=bool)
    within = d2 < cutoff * cutoff
    if not include_self:
        within = within & ~eye

    n_within = jnp.sum(within, axis=1)
    overflow = jnp.any(n_within > k_max)

    # Closest-K selection: invalid pairs pushed to +inf distance.
    d2_masked = jnp.where(within, d2, jnp.inf)
    k_eff = min(k_max, n)
    neg, idx = jax.lax.top_k(-d2_masked, k_eff)    # [N, k_eff]
    mask = neg > -jnp.inf
    row = jnp.arange(n, dtype=idx.dtype)[:, None]
    idx = jnp.where(mask, idx, row)                # self-padding keeps gathers safe
    if k_eff < k_max:
        pad = k_max - k_eff
        idx = jnp.concatenate(
            [idx, jnp.tile(row, (1, pad)).astype(idx.dtype)], axis=1)
        mask = jnp.concatenate(
            [mask, jnp.zeros((n, pad), dtype=bool)], axis=1)
    return idx.astype(jnp.int32), mask, overflow


@partial(jax.jit, static_argnames=("k_max",))
def rect_neighbor_list(query_pos, src_pos, src_valid, box, cutoff, k_max,
                       self_idx=None):
    """Padded [Nq, K] neighbor list of query atoms against a SEPARATE source
    set — the spatial-decomposition primitive (each slab queries its owned
    atoms against owned + halo positions; gamd_tpu.parallel.halo_gnn).

    Args:
        query_pos: [Nq, 3].
        src_pos:   [Ns, 3] environment positions (may include padding rows).
        src_valid: [Ns] bool validity of environment rows.
        self_idx:  optional [Nq] int — the environment index of each query
            atom, excluded from its own list (None = no exclusion).

    Returns (idx [Nq, K] into src, mask [Nq, K], overflow). Padded slots
    point at self_idx (or 0) so gathers stay in-bounds.
    """
    nq = query_pos.shape[0]
    disp = space.min_image(src_pos[None, :, :] - query_pos[:, None, :], box)
    d2 = jnp.sum(disp * disp, axis=-1)                      # [Nq, Ns]
    within = src_valid[None, :] & (d2 < cutoff * cutoff)
    if self_idx is not None:
        cols = jnp.arange(src_pos.shape[0])
        within = within & (cols[None, :] != self_idx[:, None])
    overflow = jnp.any(jnp.sum(within, axis=1) > k_max)

    d2_masked = jnp.where(within, d2, jnp.inf)
    k_eff = min(k_max, src_pos.shape[0])
    neg, idx = jax.lax.top_k(-d2_masked, k_eff)
    mask = neg > -jnp.inf
    fill = (jnp.zeros((nq,), jnp.int32) if self_idx is None
            else self_idx.astype(jnp.int32))[:, None]
    idx = jnp.where(mask, idx, fill)
    if k_eff < k_max:
        pad = k_max - k_eff
        idx = jnp.concatenate(
            [idx, jnp.tile(fill, (1, pad)).astype(idx.dtype)], axis=1)
        mask = jnp.concatenate(
            [mask, jnp.zeros((nq, pad), dtype=bool)], axis=1)
    return idx.astype(jnp.int32), mask, overflow


@jax.jit
def refresh_mask(pos, box, cutoff, idx, mask):
    """Re-validate a stale neighbor list against current positions.

    Between rebuilds the index set (built with cutoff+skin) is reused and only
    the true-cutoff mask is recomputed — the Verlet-skin trick the reference
    gets from jax-md's dr_threshold plus its own cutoff masking
    (reference: /root/reference/code/graph_utils.py:51-61).
    """
    nbr_pos = pos[idx]                                     # [N, K, 3]
    d2 = jnp.sum(space.min_image(nbr_pos - pos[:, None, :], box) ** 2, axis=-1)
    return mask & (d2 < cutoff * cutoff)


def all_pairs_edges(pos, box, cutoff):
    """Dense all-pairs edge data, mirroring the reference's get_neighbor
    semantics but with static shapes: every ordered pair is an edge slot and a
    mask selects |r| <= cutoff, i != j
    (reference: /root/reference/code/md_module.py:93-126 returns the compacted
    [2, E] version of exactly this set).

    Returns:
        disp: [N, N, 3] min-image displacements pos[j] - pos[i].
        dist: [N, N] distances.
        mask: [N, N] bool (within cutoff, excluding self).
    """
    disp = space.pairwise_displacement(pos, box)
    dist = jnp.sqrt(jnp.sum(disp * disp, axis=-1))
    n = pos.shape[0]
    mask = (dist <= cutoff) & ~jnp.eye(n, dtype=bool)
    return disp, dist, mask
