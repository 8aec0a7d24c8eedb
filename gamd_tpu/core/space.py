"""Periodic-space math: minimum-image displacements and box wrapping.

All functions are pure jnp, shape-polymorphic over leading axes, and safe
under jit / vmap / scan. The box may be a scalar (cubic) or a length-3 vector
(orthorhombic, used by the dynamic-box RPBE config); it may be a traced value,
so per-sample boxes work inside a jitted trainer.

Minimum-image convention matches the reference's
``remainder(dr + 0.5*L, L) - 0.5*L`` formulation
(reference: /root/reference/code/nn_module.py:476-480, 617-621) which maps
components into [-L/2, L/2).
"""

import jax.numpy as jnp


def min_image(dr, box):
    """Map displacement vectors to their minimum-image representative.

    Args:
        dr:  [..., 3] raw displacement(s).
        box: scalar or [3] periodic box edge length(s).

    Returns:
        [..., 3] displacement with each component in [-L/2, L/2).
    """
    box = jnp.asarray(box)
    return jnp.remainder(dr + 0.5 * box, box) - 0.5 * box


def wrap(pos, box):
    """Wrap absolute positions into the primary cell [0, L).

    Mirrors the reference's ``np.mod(pos, BOX_SIZE)`` applied before every
    neighbor search (reference: /root/reference/code/graph_utils.py:31,37).
    """
    box = jnp.asarray(box)
    return jnp.mod(pos, box)


def displacement(p_i, p_j, box):
    """Minimum-image displacement from particle i to particle j: pos_j - pos_i."""
    return min_image(p_j - p_i, box)


def distance2(p_i, p_j, box):
    """Squared minimum-image distance."""
    d = displacement(p_i, p_j, box)
    return jnp.sum(d * d, axis=-1)


def distance(p_i, p_j, box):
    """Minimum-image distance."""
    return jnp.sqrt(distance2(p_i, p_j, box))


def pairwise_displacement(pos, box):
    """All-pairs minimum-image displacement matrix.

    dr[i, j] = min_image(pos[j] - pos[i]) — i.e. row i holds displacements
    from particle i (center) to every other particle (neighbor), matching the
    sign convention of the reference's dense fallback
    (reference: /root/reference/code/md_module.py:63-78 builds
    ``pos[None,:,:] - pos[:,None,:]``).

    Args:
        pos: [N, 3].
        box: scalar or [3].

    Returns:
        [N, N, 3].
    """
    return min_image(pos[None, :, :] - pos[:, None, :], box)


def pairwise_distance2(pos, box):
    """All-pairs squared minimum-image distances, [N, N]."""
    dr = pairwise_displacement(pos, box)
    return jnp.sum(dr * dr, axis=-1)


def center_positions(pos):
    """Subtract the centroid; returns (centered, offset).

    Used by the rotation augmentation
    (reference: /root/reference/code/LJ/train_network_lj.py:64-66).
    """
    offset = jnp.mean(pos, axis=0)
    return pos - offset, offset


def pairwise_displacement_two_system(pos1, pos2, box):
    """Min-image displacement matrix between two particle sets.

    dr[i, j] = min_image(pos1[j] - pos2[i]) — the padded-shape analogue of
    the reference's pair_distance_two_system
    (reference: /root/reference/code/md_module.py:81-91).

    Args:
        pos1: [N1, 3]; pos2: [N2, 3]; box: scalar or [3].

    Returns:
        [N2, N1, 3].
    """
    return min_image(pos1[None, :, :] - pos2[:, None, :], box)
