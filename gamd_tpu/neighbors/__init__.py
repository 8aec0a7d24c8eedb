from gamd_tpu.neighbors.dense import (
    dense_neighbor_list,
    all_pairs_edges,
)
from gamd_tpu.neighbors.cell_list import cell_list_neighbor_list
from gamd_tpu.neighbors.search import NeighborList, NeighborSearcher, edge_mask_fn
from gamd_tpu.neighbors.topology import water_bond_mask, edge_type_water

__all__ = [
    "dense_neighbor_list",
    "all_pairs_edges",
    "cell_list_neighbor_list",
    "NeighborList",
    "NeighborSearcher",
    "edge_mask_fn",
    "water_bond_mask",
    "edge_type_water",
]
