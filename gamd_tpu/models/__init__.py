from gamd_tpu.models.mlp import MLP
from gamd_tpu.models.gnn import (
    RBFExpansion,
    EdgeGatedConv,
    ConvBlock,
    GAMDNet,
    cubic_kernel,
)
from gamd_tpu.models.normalizer import RunningStat, update_stat, merge_stats

__all__ = [
    "MLP",
    "RBFExpansion",
    "EdgeGatedConv",
    "ConvBlock",
    "GAMDNet",
    "cubic_kernel",
    "RunningStat",
    "update_stat",
    "merge_stats",
]
