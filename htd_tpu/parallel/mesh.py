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


def make_global_batch(mesh: Mesh, tree):
    """Form a GLOBAL batch array from each process's local shard.

    Every leaf's dim 0 is the per-process batch; the result is a global
    jax.Array sharded over 'data' whose global dim 0 is
    per_process * process_count. Single-process: equivalent to
    shard_pytree_batch. This replaces the reference's per-rank DataLoader +
    DDP input convention (SURVEY.md §5.8) with jax.Array semantics.
    """
    if jax.process_count() == 1:
        return shard_pytree_batch(mesh, tree)
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree,
    )


def host_slice(items, process_id: Optional[int] = None,
               process_count: Optional[int] = None):
    """This process's contiguous slice of a global per-step record list.

    DistributedGroupSampler semantics adapted to static shapes: batches are
    formed group-homogeneous at GLOBAL batch size (orientation must agree
    across hosts so the global array has one shape), then rank-sliced —
    same per-rank distribution as the reference sampler
    (group_sampler.py:51-118), with the epoch seed applied by the caller.
    """
    pc = process_count if process_count is not None else jax.process_count()
    pid = process_id if process_id is not None else jax.process_index()
    n = len(items)
    assert n % pc == 0, f"global batch {n} not divisible by {pc} processes"
    per = n // pc
    return items[pid * per:(pid + 1) * per]


def gather_detections(boxes, scores, labels, valid, img_ids):
    """All-gather fixed-size per-host detection arrays across processes.

    Equivalent of the reference's padded GPU result collection
    (apis/test.py:160-190). Inputs are per-host numpy arrays with leading
    dim = per-host image count; returns concatenated global arrays.
    """
    if jax.process_count() == 1:
        return boxes, scores, labels, valid, img_ids
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(
        (np.asarray(boxes), np.asarray(scores), np.asarray(labels),
         np.asarray(valid), np.asarray(img_ids))
    )
    return tuple(np.concatenate(list(x), axis=0) for x in out)
