"""Analytic molecular topology tests for the padded neighbor layout.

The reference encodes water topology two ways:

  * a DGL "bond graph" of O-H bonds queried per edge with has_edges_between
    (reference: /root/reference/code/water/train_network_tip3p.py:37-41 builds
    bonds [i, i+1], [i, i+2] for every O at index i = 0 mod 3;
    /root/reference/code/nn_module.py:510-511 appends the boolean channel);
  * a jitted analytic same-molecule test, edge_type_water
    (reference: /root/reference/code/md_module.py:129-142).

Both reduce to integer arithmetic on atom indices for the O,H,H layout, so
here they are pure index math over the [N, K] arrays — no graph object.
"""

import jax.numpy as jnp


def water_bond_mask(center_idx, neigh_idx):
    """O-H covalent bond indicator (the model's bond channel).

    True iff one endpoint is the molecule's O (index 0 mod 3) and the other
    is one of its two H's (indices +1, +2). H-H pairs are NOT bonds — the
    reference bond graph holds only O-H edges.

    Args:
        center_idx: [...] int atom ids.
        neigh_idx:  [...] int atom ids (same shape).

    Returns:
        [...] float32 in {0., 1.}.
    """
    i, j = center_idx, neigh_idx
    i_is_o = i % 3 == 0
    j_is_o = j % 3 == 0
    o_to_h = i_is_o & (j - i >= 1) & (j - i <= 2)
    h_to_o = j_is_o & (i - j >= 1) & (i - j <= 2)
    return (o_to_h | h_to_o).astype(jnp.float32)


def edge_type_water(i, j):
    """Same-molecule test: 0 if i and j belong to one water molecule
    (including H-H), 1 otherwise. Matches the reference's edge_type_water
    (reference: /root/reference/code/md_module.py:129-142)."""
    cond1 = (i % 3 == 0) & (j - i > 0) & (j - i <= 2)
    cond2 = (i % 3 == 1) & (jnp.abs(j - i) <= 1)
    cond3 = (i % 3 == 2) & (i - j > 0) & (i - j <= 2)
    in_same_molecule = cond1 | cond2 | cond3
    return jnp.where(in_same_molecule, 0, 1)


def neighbor_bond_channel(idx):
    """Bond channel over a padded neighbor list.

    Args:
        idx: [..., N, K] neighbor ids (center = second-to-last axis index;
            leading axes, e.g. replicas, broadcast — the topology is
            identical across them).

    Returns:
        [..., N, K] float32 bond indicator.
    """
    n = idx.shape[-2]
    center = jnp.arange(n, dtype=idx.dtype)[:, None]
    return water_bond_mask(center, idx)
