"""Neighbor-list container and a stateful searcher with overflow recovery.

API-level replacement for the reference's NeighborSearcher
(reference: /root/reference/code/graph_utils.py:11-44): positions are wrapped
into the box before every search, the list is built at cutoff+skin so it can
be reused across steps, and a capacity overflow triggers a rebuild with a
grown capacity (the reference rebuilds via jax-md's allocate path on
did_buffer_overflow, graph_utils.py:41-43).
"""

from typing import NamedTuple

import jax.numpy as jnp

from gamd_tpu.core import space
from gamd_tpu.neighbors import dense
from gamd_tpu.neighbors.cell_list import cell_list_neighbor_list


class NeighborList(NamedTuple):
    """Padded fixed-capacity neighbor list.

    idx:  [N, K] int32 neighbor ids (row index in padded slots).
    mask: [N, K] bool — True where the slot holds a real neighbor within the
          build radius (cutoff + skin).
    overflow: scalar bool — capacity was exceeded; results may drop edges.
    reference_pos: [N, 3] positions the list was built from (for staleness
          checks via max displacement).
    """

    idx: jnp.ndarray
    mask: jnp.ndarray
    overflow: jnp.ndarray
    reference_pos: jnp.ndarray


def build_neighbor_list(pos, box, cutoff, skin, k_max,
                        method="dense", **cell_kwargs) -> NeighborList:
    """Build a NeighborList at radius cutoff+skin."""
    pos = space.wrap(pos, box)
    radius = cutoff + skin
    if method == "dense":
        idx, mask, ovf = dense.dense_neighbor_list(pos, box, radius, k_max)
    elif method == "cell":
        idx, mask, ovf = cell_list_neighbor_list(
            pos, float(box), float(radius), k_max, **cell_kwargs)
    else:
        raise ValueError(f"unknown neighbor method {method!r}")
    return NeighborList(idx=idx, mask=mask, overflow=ovf, reference_pos=pos)


def edge_mask_fn(pos, box, cutoff, nbrs: NeighborList):
    """True-cutoff edge mask over a (possibly stale) neighbor list.

    Equivalent of the reference's graph_network_nbr_fn: given the padded
    index array, mask slots that are padding or outside the *actual* cutoff
    (reference: /root/reference/code/graph_utils.py:47-63).
    """
    return dense.refresh_mask(pos, box, cutoff, nbrs.idx, nbrs.mask)


def needs_rebuild(pos, box, skin, nbrs: NeighborList):
    """Half-skin displacement test: list is stale once any particle moved
    more than skin/2 since the reference positions."""
    d2 = jnp.sum(space.min_image(space.wrap(pos, box) - nbrs.reference_pos,
                                 box) ** 2, axis=-1)
    return jnp.any(d2 > (0.5 * skin) ** 2)


class NeighborSearcher:
    """Host-side convenience wrapper with automatic capacity growth.

    Mirrors the reference's NeighborSearcher lifecycle
    (init_new_neighbor_lst / update_neighbor_lst,
    reference: /root/reference/code/graph_utils.py:29-44) but returns padded
    [N, K] lists. On overflow the capacity is grown 1.5x and the list rebuilt
    — recompilation happens at most O(log K) times over a run.
    """

    def __init__(self, box, cutoff, skin=None, k_max=64, method="dense"):
        self.box = box
        self.cutoff = cutoff
        self.skin = cutoff / 6.0 if skin is None else skin
        self.k_max = int(k_max)
        self.method = method
        self.has_been_init = False

    def init_new_neighbor_lst(self, pos) -> NeighborList:
        nbrs = self._build_with_growth(pos)
        self.has_been_init = True
        return nbrs

    def update_neighbor_lst(self, pos, nbrs: NeighborList) -> NeighborList:
        if bool(needs_rebuild(pos, self.box, self.skin, nbrs)):
            return self._build_with_growth(pos)
        return nbrs

    def _build_with_growth(self, pos) -> NeighborList:
        while True:
            nbrs = build_neighbor_list(pos, self.box, self.cutoff, self.skin,
                                       self.k_max, method=self.method)
            if not bool(nbrs.overflow):
                return nbrs
            self.k_max = int(self.k_max * 1.5 + 1)
