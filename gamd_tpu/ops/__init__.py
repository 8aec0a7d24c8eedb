from gamd_tpu.ops.aggregate import gather_multiply_aggregate
from gamd_tpu.ops.pallas_mp import pallas_gather_multiply_aggregate

__all__ = [
    "gather_multiply_aggregate",
    "pallas_gather_multiply_aggregate",
]
