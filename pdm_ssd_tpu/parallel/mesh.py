"""Device mesh + sharding rules: the entire "distributed communication layer".

TPU-native replacement for the reference's NCCL/DDP stack (SURVEY.md §2.7:
`torch.nn.parallel.DistributedDataParallel`, `common_utils.py:162-204`,
`commu_utils.py`): one `jax.sharding.Mesh`, batch arrays sharded on the
`data` axis, params replicated. Gradient all-reduce, SyncBN-style stat
averaging and metric reduction are `psum`s XLA inserts automatically from
these shardings — there is no hand-written communication code anywhere in
the framework.

Scales to multi-host by constructing the same mesh over
`jax.devices()` across processes (DCN axis outermost).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_parallel_shardings(mesh: Mesh):
    """Returns (batch_sharding, replicated_sharding)."""
    return NamedSharding(mesh, P(DATA_AXIS)), NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put each per-sample array with the batch dim split over the data axis.
    Non-array entries (calib objects, frame ids) stay on host."""
    batch_sharding, _ = data_parallel_shardings(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object and v.ndim >= 1:
            out[k] = jax.device_put(v, batch_sharding)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    _, rep = data_parallel_shardings(mesh)
    return jax.device_put(tree, rep)


def make_mesh_for_batch(batch_size: int, axis_name: str = DATA_AXIS) -> Mesh:
    """Mesh whose data axis divides `batch_size` (eval batches may be smaller
    than the device count; use the largest compatible device subset)."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))
