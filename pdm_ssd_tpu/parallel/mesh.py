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
    than the device count; use the largest compatible device subset).

    Prefer `make_mesh()` + `pad_batch_to` — that keeps every chip busy
    instead of idling the ones the batch doesn't divide into."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def padded_batch_size(batch_size: int, mesh: Mesh) -> int:
    """Smallest multiple of the mesh's data extent >= batch_size (the eval
    sampler's padding rule, `datasets/__init__.py:31-51` in the reference)."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    return ((batch_size + n - 1) // n) * n


def pad_batch_to(batch: dict, target_b: int) -> dict:
    """Pad every per-sample array up to `target_b` along dim 0 by wrapping
    around (repeating real samples — always numerically safe, unlike zero
    frames). Callers slice model outputs back to the real batch size."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object and v.ndim >= 1 \
                and v.shape[0] < target_b:
            reps = int(np.ceil(target_b / v.shape[0]))
            out[k] = np.concatenate([v] * reps, axis=0)[:target_b]
        else:
            out[k] = v
    return out


# ---- multi-host (DCN) recipe ------------------------------------------------

def init_multihost(coordinator: str | None = None, num_processes: int | None = None,
                   process_id: int | None = None):
    """Initialize the JAX distributed runtime for multi-host training.

    TPU-native analog of `common_utils.init_dist_pytorch/slurm`
    (`pcdet/utils/common_utils.py:162-204`): on Cloud TPU pods the arguments
    auto-discover; pass explicit coordinator/process info elsewhere (and for
    the 2-process CPU test, tests/test_multihost.py)."""
    import jax
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_multihost_mesh(axis_name: str = DATA_AXIS) -> Mesh:
    """Global data-parallel mesh over all processes' devices with the DCN
    (inter-host) dimension OUTERMOST, so the data axis maps gradient psums
    onto ICI within a host first and crosses DCN only for the final fold —
    the layout `jax.experimental.mesh_utils.create_hybrid_device_mesh`
    produces. Falls back to a flat mesh for single-host."""
    if jax.process_count() == 1:
        return make_mesh(axis_name=axis_name)
    try:
        from jax.experimental import mesh_utils
        local = jax.local_device_count()
        devices = mesh_utils.create_hybrid_device_mesh(
            (local,), (jax.process_count(),))
        return Mesh(devices.reshape(-1), (axis_name,))
    except Exception:
        # deterministic fallback: devices grouped by process (DCN-outer)
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        return Mesh(np.asarray(devs), (axis_name,))


def shard_batch_multihost(local_batch: dict, mesh: Mesh) -> dict:
    """Build GLOBAL arrays from per-process local batch shards
    (`jax.make_array_from_process_local_data`): each process feeds its own
    samples; the global batch dim = sum over processes. The reference's
    DistributedSampler+DDP equivalent."""
    batch_sharding, _ = data_parallel_shardings(mesh)
    out = {}
    for k, v in local_batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object and v.ndim >= 1:
            out[k] = jax.make_array_from_process_local_data(batch_sharding, v)
        else:
            out[k] = v
    return out
