"""Backend dispatch for the hot point ops.

On TPU backends the Pallas FPS kernel and the grid-hash ball query replace the
pure-JAX references; on CPU (tests, debugging) the references run. The
references define the semantics — kernels are parity-tested against them in
`tests/test_pallas_kernels.py` (TPU-only, skipped on CPU).
"""
from __future__ import annotations

import jax

from . import pointnet2 as ref


def _on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat in ('tpu', 'axon')


def farthest_point_sample(xyz, npoint: int):
    if _on_tpu():
        from .pallas.fps import farthest_point_sample_pallas
        return farthest_point_sample_pallas(xyz, npoint)
    return ref.farthest_point_sample(xyz, npoint)


def ball_query(radius: float, nsample: int, xyz, new_xyz, pc_range=None, cap: int = 48):
    if _on_tpu() and pc_range is not None:
        from .pallas.retired.grid_query import grid_ball_query_pallas
        return grid_ball_query_pallas(radius, nsample, xyz, new_xyz,
                                      pc_range=tuple(pc_range))
    return ref.ball_query(radius, nsample, xyz, new_xyz)


def grouping_operation(features, idx):
    """Neighbor feature grouping: features (B, N, C), idx (B, M, K) ->
    (B, M, K, C). Plain row gather: XLA's TPU gather moves ~6 ns/row in-graph
    (round-2 calibration; the round-1 one-hot matmul kernel predates that
    measurement and only wins at extreme row counts)."""
    return ref.grouping_operation(features, idx)


def gather_operation(features, idx):
    """features (B, N, C), idx (B, M) -> (B, M, C)."""
    return ref.gather_operation(features, idx)
