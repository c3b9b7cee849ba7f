"""PointRCNN ROI refinement head, fixed-shape TPU formulation.

Re-design of `PointRCNNHead` (`pcdet/models/roi_heads/pointrcnn_head.py`) and
the roipoint pooling CUDA op (`roipoint_pool3d_utils.py:9-62`):

- ROI point pooling: membership of backbone points in the (enlarged) ROI via
  the vectorized rotation test, then up-to-K in-box points per ROI selected
  with the sort-free modular-rank masked-max (same primitive as the grid ball
  query — no CUDA-style per-ROI loops, no top_k).
- canonical transform: pooled points into the ROI frame, features concatenated
  with depth + score channels (reference "merge-down" decoration).
- canonical PointNet: shared Dense stack -> masked max-pool -> FC heads for
  per-ROI cls confidence + 7-dof canonical box residuals.

Pools from the backbone's sampled point set (`point_coords`/`point_features`)
rather than raw 16k points — the TPU trade: membership over 16k points per ROI
is vector-cheap but the feature gather is not; the sampled set carries the
aggregated context already.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import box_ops
from ...utils.config import as_cfg
from ..layers import FCStack, SharedMLP, masked_max
from .roi_head_template import RoIHeadTemplate


def pool_roi_points(points, rois, num_sampled: int, extra: float = 0.0,
                    roi_mask=None):
    """points: (B, N, 3), rois: (B, R, 7) -> idx (B, R, K) int32 + mask.
    Selects up to K points inside each (enlarged) ROI (any-K semantics)."""
    B, N = points.shape[:2]
    R = rois.shape[1]
    big = box_ops.enlarge_box3d(rois, (extra, extra, extra))

    def single(pts, boxes):
        shift = pts[:, None, :] - boxes[None, :, :3]            # (N, R, 3)
        cosa = jnp.cos(-boxes[:, 6])
        sina = jnp.sin(-boxes[:, 6])
        lx = shift[..., 0] * cosa[None] - shift[..., 1] * sina[None]
        ly = shift[..., 0] * sina[None] + shift[..., 1] * cosa[None]
        inside = ((jnp.abs(shift[..., 2]) <= boxes[None, :, 5] / 2)
                  & (jnp.abs(lx) < boxes[None, :, 3] / 2)
                  & (jnp.abs(ly) < boxes[None, :, 4] / 2))      # (N, R)
        return inside.T                                          # (R, N)

    inside = jax.vmap(single)(points, big)                       # (B, R, N)
    if roi_mask is not None:
        inside = inside & roi_mask[..., None]
    rank = jnp.cumsum(inside, axis=-1) - 1
    mod = rank % num_sampled
    pos = jnp.arange(N, dtype=jnp.int32)
    slots = []
    for k in range(num_sampled):
        m = inside & (mod == k)
        slots.append(jnp.max(jnp.where(m, pos, -1), axis=-1))
    idx = jnp.stack(slots, axis=-1)                              # (B, R, K)
    valid = idx >= 0
    first = jnp.maximum(idx[..., 0:1], 0)
    idx = jnp.where(valid, idx, first)
    return idx.astype(jnp.int32), valid


class PointRCNNHead(RoIHeadTemplate):
    """Config: NUM_SAMPLED_POINTS, ROI_POINT_EXTRA, XYZ_UP_LAYER, CLS_FC,
    REG_FC, SHARED_FC, NMS_CONFIG{TRAIN,TEST}, TARGET_CONFIG, LOSS_CONFIG."""
    input_channels: int = 0

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        K = cfg.get('NUM_SAMPLED_POINTS', 64)

        batch = self.proposal_layer(batch, training=training)
        if training and 'gt_boxes' in batch:
            # reference order: subsample/reorder ROIs BEFORE pooling so the
            # head predicts on the target-aligned set (`assign_targets` then
            # pooling, roi_head_template.py:104-140)
            targets = self.assign_targets(batch)
            batch['roi_targets'] = targets
        rois = batch['rois']                                    # (B, R, 7)
        B, R = rois.shape[:2]

        pts = batch['point_coords']                             # (B, Np, 3)
        feats = batch['point_features']                         # (B, Np, C)
        scores = batch.get('point_cls_scores')                  # (B, Np)

        idx, valid = pool_roi_points(
            pts, rois, K, extra=cfg.get('ROI_POINT_EXTRA', 0.0),
            roi_mask=batch.get('roi_mask'))

        def gather(t, i):
            return jnp.take_along_axis(
                t, i.reshape(i.shape[0], -1)[..., None], axis=1
            ).reshape(i.shape + (t.shape[-1],))

        pooled_xyz = gather(pts, idx)                           # (B, R, K, 3)
        pooled_feat = gather(feats, idx)                        # (B, R, K, C)
        # canonical transform into roi frame
        local = pooled_xyz - rois[:, :, None, :3]
        local = box_ops.rotate_points_along_z(
            local.reshape(B * R, K, 3), -rois[..., 6].reshape(B * R)
        ).reshape(B, R, K, 3)
        depth = jnp.linalg.norm(pooled_xyz, axis=-1, keepdims=True)
        parts = [local, depth / 70.0]
        if scores is not None:
            parts.append(gather(scores[..., None], idx))
        x = jnp.concatenate(parts + [pooled_feat], axis=-1)
        x = jnp.where(valid[..., None], x, 0.0)

        x = SharedMLP(tuple(cfg.get('XYZ_UP_LAYER', [128, 128])),
                      name='up_mlp')(x, training=training)
        x = masked_max(x, valid, axis=2)                        # (B, R, C')
        x = SharedMLP(tuple(cfg.get('SHARED_FC', [256, 256])),
                      name='shared_fc')(x, training=training)
        rcnn_cls = FCStack(tuple(cfg.get('CLS_FC', [256])), 1,
                           name='cls_fc')(x, training=training)
        rcnn_reg = FCStack(tuple(cfg.get('REG_FC', [256])), 7,
                           name='reg_fc')(x, training=training)
        batch['rcnn_cls_preds'] = rcnn_cls                      # (B, R, 1)
        batch['rcnn_reg_preds'] = rcnn_reg                      # (B, R, 7)
        return batch
