"""Device mesh + sharding helpers.

The reference's distribution layer is NCCL DDP (SURVEY.md §2.10/§5.8:
MMDistributedDataParallel, bucketed grad allreduce, dist launchers). The
TPU-native equivalent is a 1-D data mesh: the batch dim is sharded over
'data', params are replicated, and XLA inserts the gradient all-reduce
(riding ICI) automatically for jit-compiled train steps.

A single-process multi-host setup extends this transparently:
`jax.distributed.initialize()` + the same mesh over all devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_batch(mesh: Mesh, tree):
    """Device-put every leaf with its dim 0 sharded across 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
