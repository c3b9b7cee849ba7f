"""RoI-aware grid pooling (PartA2) — fixed-shape TPU formulation.

Re-design of the reference `roiaware_pool3d` CUDA extension
(`pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:111-311`,
python API `roiaware_pool3d_utils.RoIAwarePool3d`): pool per-point features
into a G^3 voxel grid inside each (rotated) ROI with max or avg reduction.

Instead of per-(box, point) CUDA scatter: pre-select up to P in-box points
per ROI (`pool_roi_points` — shared with the other ROI heads), compute each
point's local grid cell, and reduce with a one-hot cell-membership tensor:
avg as two MXU matmuls (sum + count), max as a masked per-channel reduction.
The P cap approximates the reference's "all in-box points" (same spirit as
its per-cell max; the pipeline shuffles points so the cap drop is uniform).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import box_ops


def roiaware_pool(points: jax.Array, feats: jax.Array, rois: jax.Array,
                  grid_size: int, pool: str = 'max', num_sampled: int = 128,
                  roi_mask: jax.Array | None = None):
    """points (B, N, 3), feats (B, N, C), rois (B, R, 7) ->
    (B, R, G, G, G, C) pooled grid (empty cells 0)."""
    from ..models.roi_heads.pointrcnn_head import pool_roi_points

    B, N, _ = points.shape
    R = rois.shape[1]
    G = int(grid_size)
    G3 = G ** 3
    C = feats.shape[-1]
    P = num_sampled

    idx, valid = pool_roi_points(points, rois, P, extra=0.0, roi_mask=roi_mask)

    def gather(t, i):
        return jnp.take_along_axis(
            t, i.reshape(i.shape[0], -1)[..., None], axis=1
        ).reshape(i.shape + (t.shape[-1],))

    pxyz = gather(points, idx)                       # (B, R, P, 3)
    pfeat = gather(feats, idx)                       # (B, R, P, C)

    # local (ROI-frame) coords -> grid cells; reference maps the ROI box
    # extent [(-d/2, d/2)] onto [0, G) per axis with z from the bottom face
    local = pxyz - rois[:, :, None, :3]
    local = box_ops.rotate_points_along_z(
        local.reshape(B * R, P, 3), -rois[..., 6].reshape(B * R)
    ).reshape(B, R, P, 3)
    rel = (local / jnp.clip(rois[:, :, None, 3:6], 1e-4) + 0.5)  # [0, 1)
    cell = jnp.clip((rel * G).astype(jnp.int32), 0, G - 1)
    cid = (cell[..., 0] * G + cell[..., 1]) * G + cell[..., 2]   # (B, R, P)

    onehot = ((cid[..., None] == jnp.arange(G3)) & valid[..., None])  # (B,R,P,G3)
    if pool == 'avg':
        oh = onehot.astype(jnp.bfloat16)
        dn = (((2,), (2,)), ((0, 1), (0, 1)))
        sums = jax.lax.dot_general(
            pfeat.astype(jnp.bfloat16).transpose(0, 1, 3, 2), oh,
            (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)       # (B, R, C, G3)
        cnt = jnp.sum(oh.astype(jnp.float32), axis=2)            # (B, R, G3)
        out = (sums / jnp.clip(cnt[:, :, None, :], 1.0)).transpose(0, 1, 3, 2)
        out = jnp.where(cnt[..., None] > 0, out, 0.0)
    else:
        big = jnp.where(onehot[..., None], pfeat[:, :, :, None, :],
                        -jnp.inf)                     # (B, R, P, G3, C)
        out = jnp.max(big, axis=2)
        any_pt = jnp.any(onehot, axis=2)
        out = jnp.where(any_pt[..., None], out, 0.0)
    return out.reshape(B, R, G, G, G, C)
