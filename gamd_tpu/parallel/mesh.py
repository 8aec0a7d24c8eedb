"""Device-mesh helpers for SPMD training and batched simulation.

Replaces the reference's Lightning DDP-over-NCCL data parallelism
(reference: /root/reference/code/LJ/train_network_lj.py:374-382) with a
jax.sharding Mesh: the train step is jitted once, batches are placed with a
'dp'-sharded NamedSharding, parameters stay replicated, and XLA lowers the
gradient reduction to ICI collectives on real TPU topologies (DCN across
hosts). No process group, no gradient bucket tuning, no interop shims.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def dp_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
