"""Auxiliary point-classification head (train-only, dropped at inference).

Re-design of `PointHeadSimple` (`pcdet/models/dense_heads/point_head_simple.py:7-57`)
— the "PDM as auxiliary head" pattern: per-point foreground supervision that
improves the backbone without inference cost (the PDM-SSD paper's aux-head
variant, `README.md:12`).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import box_ops, losses
from ..layers import FCStack
from ...utils.config import as_cfg


class PointHeadSimple(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        feats_key = 'point_features_before_fusion' \
            if cfg.get('USE_POINT_FEATURES_BEFORE_FUSION', False) \
            else 'point_features'
        feats = batch[feats_key]
        cls_preds = FCStack(tuple(cfg.CLS_FC), self.num_class,
                            name='cls_layers')(feats, training=training)
        batch['aux_point_cls_preds'] = cls_preds
        batch['aux_point_cls_scores'] = jax.nn.sigmoid(cls_preds)
        return batch

    def assign_targets(self, batch: dict) -> dict:
        """Segment labels only, extended-box ignore zone
        (`point_head_simple.py:22-43` -> `assign_stack_targets`)."""
        points = batch['point_coords']
        gt_boxes = batch['gt_boxes']
        gt_mask = batch.get('gt_mask')
        if gt_mask is None:
            gt_mask = jnp.any(gt_boxes[..., 3:6] > 0, axis=-1)
        extra = as_cfg(self.model_cfg).TARGET_CONFIG.get('GT_EXTRA_WIDTH', [0.2, 0.2, 0.2])
        ext_boxes = box_ops.enlarge_box3d(gt_boxes, extra)

        def single(pts, gts, ext, m):
            box_idx = box_ops.points_in_boxes(pts, gts[:, :7], box_mask=m)
            ext_idx = box_ops.points_in_boxes(pts, ext[:, :7], box_mask=m)
            fg = box_idx >= 0
            ignore = fg ^ (ext_idx >= 0)
            labels = jnp.where(fg, 1, 0)
            return jnp.where(ignore, -1, labels)

        labels = jax.vmap(single)(points, gt_boxes, ext_boxes, gt_mask)
        return {'aux_point_cls_labels': labels}

    def get_loss(self, batch: dict, targets: dict) -> tuple[jax.Array, dict]:
        labels = targets['aux_point_cls_labels'].reshape(-1)
        cls_preds = batch['aux_point_cls_preds'].reshape(-1, self.num_class)
        positives = labels > 0
        cls_weights = ((labels >= 0)).astype(jnp.float32)
        pos_norm = jnp.sum(positives.astype(jnp.float32))
        cls_weights = cls_weights / jnp.clip(pos_norm, min=1.0)
        one_hot = jnp.where(positives[:, None], 1.0, 0.0)
        one_hot = jnp.broadcast_to(one_hot, cls_preds.shape)
        loss = jnp.sum(losses.sigmoid_focal_loss(cls_preds, one_hot, cls_weights))
        lw = as_cfg(self.model_cfg).LOSS_CONFIG.LOSS_WEIGHTS
        loss = loss * lw['point_cls_weight']
        return loss, {'aux_point_loss_cls': loss}
