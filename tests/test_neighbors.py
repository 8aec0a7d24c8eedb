"""Neighbor search: padded lists must agree with a brute-force O(N^2) oracle."""

import numpy as np
import pytest

from gamd_tpu.core import space
from gamd_tpu.neighbors import (
    dense_neighbor_list,
    cell_list_neighbor_list,
    edge_type_water,
    water_bond_mask,
)
from gamd_tpu.neighbors.dense import refresh_mask
from gamd_tpu.neighbors.search import NeighborSearcher, build_neighbor_list
from gamd_tpu.neighbors.topology import neighbor_bond_channel


def brute_force_pairs(pos, box, cutoff):
    """Set of (i, j) ordered pairs with min-image distance < cutoff, i != j."""
    n = pos.shape[0]
    d2 = np.asarray(space.pairwise_distance2(pos, box))
    pairs = set()
    for i in range(n):
        for j in range(n):
            if i != j and d2[i, j] < cutoff**2:
                pairs.add((i, j))
    return pairs


def padded_to_pairs(idx, mask):
    idx = np.asarray(idx)
    mask = np.asarray(mask)
    pairs = set()
    for i in range(idx.shape[0]):
        for k in range(idx.shape[1]):
            if mask[i, k]:
                pairs.add((i, int(idx[i, k])))
    return pairs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dense_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    box, cutoff, n = 10.0, 3.0, 40
    pos = rng.uniform(0, box, size=(n, 3)).astype(np.float32)
    idx, mask, overflow = dense_neighbor_list(pos, box, cutoff, k_max=40)
    assert not bool(overflow)
    assert padded_to_pairs(idx, mask) == brute_force_pairs(pos, box, cutoff)


def test_dense_overflow_flag():
    # 20 coincident particles, capacity 8 -> every row overflows.
    pos = np.zeros((20, 3), dtype=np.float32)
    idx, mask, overflow = dense_neighbor_list(pos, 10.0, 1.0, k_max=8)
    assert bool(overflow)
    assert np.asarray(mask).sum(axis=1).max() == 8


def test_dense_padding_is_self_index():
    pos = np.array([[0, 0, 0], [5, 5, 5]], dtype=np.float32)
    idx, mask, _ = dense_neighbor_list(pos, 20.0, 1.0, k_max=4)
    idx, mask = np.asarray(idx), np.asarray(mask)
    assert not mask.any()
    np.testing.assert_array_equal(idx, [[0] * 4, [1] * 4])


def test_dense_keeps_closest_on_overflow():
    # Center atom at origin with shells at r=1 and r=2; capacity 3 keeps r=1.
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [2, 0, 0], [0, 2, 0]],
        dtype=np.float32,
    )
    idx, mask, overflow = dense_neighbor_list(pos, 50.0, 2.5, k_max=3)
    assert bool(overflow)
    kept = set(np.asarray(idx)[0][np.asarray(mask)[0]])
    assert kept == {1, 2, 3}


def test_refresh_mask_prunes_moved_atoms():
    box, cutoff = 20.0, 3.0
    pos = np.array([[0, 0, 0], [2, 0, 0], [4.5, 0, 0]], dtype=np.float32)
    idx, mask, _ = dense_neighbor_list(pos, box, cutoff + 1.5, k_max=4)
    # Initially atom 1 within build radius of both ends.
    new_pos = pos.copy()
    new_pos[1, 0] = 3.5   # moved out of true cutoff of atom 0
    new_mask = np.asarray(refresh_mask(new_pos, box, cutoff, idx, mask))
    pairs = padded_to_pairs(np.asarray(idx), new_mask)
    assert (0, 1) not in pairs
    assert (2, 1) in pairs   # 4.5 - 3.5 = 1.0 < cutoff


@pytest.mark.parametrize("n,box,cutoff", [(64, 12.0, 3.0), (200, 15.0, 4.0)])
def test_cell_list_matches_dense(n, box, cutoff):
    rng = np.random.RandomState(3)
    pos = rng.uniform(0, box, size=(n, 3)).astype(np.float32)
    k = 64
    d_idx, d_mask, d_ovf = dense_neighbor_list(pos, box, cutoff, k_max=k)
    c_idx, c_mask, c_ovf = cell_list_neighbor_list(
        pos, box, cutoff, k_max=k, cell_capacity=32, chunk=64)
    assert not bool(d_ovf) and not bool(c_ovf)
    assert padded_to_pairs(c_idx, c_mask) == padded_to_pairs(d_idx, d_mask)


def test_cell_list_rejects_small_box():
    pos = np.zeros((4, 3), dtype=np.float32)
    with pytest.raises(ValueError):
        cell_list_neighbor_list(pos, 5.0, 3.0, k_max=4)


def test_searcher_grows_capacity():
    rng = np.random.RandomState(4)
    box = 6.0
    pos = rng.uniform(0, box, size=(60, 3)).astype(np.float32)
    searcher = NeighborSearcher(box, cutoff=2.5, k_max=2)
    nbrs = searcher.init_new_neighbor_lst(pos)
    assert not bool(nbrs.overflow)
    assert searcher.k_max > 2
    # Agreement with the oracle at build radius (cutoff + skin).
    radius = searcher.cutoff + searcher.skin
    assert padded_to_pairs(nbrs.idx, nbrs.mask) == brute_force_pairs(
        np.asarray(space.wrap(pos, box)), box, radius)


def test_searcher_update_reuses_until_stale():
    rng = np.random.RandomState(5)
    box = 10.0
    pos = rng.uniform(0, box, size=(30, 3)).astype(np.float32)
    searcher = NeighborSearcher(box, cutoff=3.0, k_max=40)
    nbrs = searcher.init_new_neighbor_lst(pos)
    # Tiny move: same object returned (no rebuild).
    nbrs2 = searcher.update_neighbor_lst(pos + 0.01, nbrs)
    assert nbrs2 is nbrs
    # Large move: rebuilt.
    nbrs3 = searcher.update_neighbor_lst(pos + 2.0, nbrs)
    assert nbrs3 is not nbrs


def test_water_bond_mask():
    # Molecule 0: atoms 0(O),1(H),2(H); molecule 1: atoms 3(O),4(H),5(H)
    i = np.array([0, 0, 1, 2, 1, 0, 3, 4])
    j = np.array([1, 2, 0, 0, 2, 3, 4, 3])
    out = np.asarray(water_bond_mask(i, j))
    #                O-H  O-H  H-O  H-O  H-H  O-O  O-H  H-O
    np.testing.assert_array_equal(out, [1, 1, 1, 1, 0, 0, 1, 1])


def test_edge_type_water_same_molecule():
    i = np.array([0, 0, 1, 2, 1, 0, 2, 5])
    j = np.array([1, 2, 2, 1, 0, 3, 3, 3])
    out = np.asarray(edge_type_water(i, j))
    # same-molecule (incl. H-H) -> 0; cross-molecule -> 1
    np.testing.assert_array_equal(out, [0, 0, 0, 0, 0, 1, 1, 0])


def test_neighbor_bond_channel_shape():
    idx = np.array([[1, 2, 0], [0, 2, 1], [0, 1, 2]])
    out = np.asarray(neighbor_bond_channel(idx))
    assert out.shape == (3, 3)
    assert out[0, 0] == 1.0  # 0-1 O-H bond
    assert out[0, 1] == 1.0  # 0-2 O-H bond


def test_build_neighbor_list_wraps_positions():
    pos = np.array([[21.0, 0.5, 0.5], [1.0, 0.5, 0.5]], dtype=np.float32)
    nbrs = build_neighbor_list(pos, 20.0, 3.0, 0.5, k_max=2)
    assert bool(np.asarray(nbrs.mask)[0, 0])  # 21 wraps to 1 -> distance 0...
    # distance between wrapped 1.0 and 1.0 is 0 -> within cutoff
