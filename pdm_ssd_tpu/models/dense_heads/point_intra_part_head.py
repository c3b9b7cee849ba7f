"""Intra-object part-location head (PartA2 stage-1 point supervision).

Re-design of `PointIntraPartOffsetHead`
(`pcdet/models/dense_heads/point_intra_part_head.py:7-120`): per voxel-point
foreground segmentation + intra-object part location regression (the point's
normalized position inside its owning box, sigmoid-activated). Fixed-shape:
operates on the padded (B, V, C) voxel-point features with a validity mask.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import box_ops, losses
from ..layers import FCStack
from ...utils.config import as_cfg


class PointIntraPartOffsetHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        feats = batch['point_features']                  # (B, V, C)
        cls_preds = FCStack(tuple(cfg.get('CLS_FC', [128])), self.num_class,
                            name='cls_layers')(feats, training=training)
        part_preds = FCStack(tuple(cfg.get('PART_FC', [128])), 3,
                             name='part_reg_layers')(feats, training=training)
        batch['point_cls_preds'] = cls_preds
        batch['point_part_preds'] = part_preds
        batch['point_cls_scores'] = jnp.max(jax.nn.sigmoid(cls_preds), -1)
        batch['point_part_offset'] = jax.nn.sigmoid(part_preds)
        return batch

    def assign_targets(self, batch: dict) -> dict:
        """Seg labels via points-in-boxes (extended ignore zone) + part
        targets = local box-frame coords normalized to [0, 1] (z measured
        from the bottom face), reference `assign_targets:64-91` ->
        `assign_stack_targets(ret_part_labels=True)`."""
        points = batch['point_coords']                   # (B, V, 3)
        pmask = batch.get('point_mask')
        gt_boxes = batch['gt_boxes']
        gt_mask = batch.get('gt_mask')
        if gt_mask is None:
            gt_mask = jnp.any(gt_boxes[..., 3:6] > 0, axis=-1)
        extra = as_cfg(self.model_cfg).get('TARGET_CONFIG', {})
        extra = extra.get('GT_EXTRA_WIDTH', [0.2, 0.2, 0.2]) \
            if hasattr(extra, 'get') else [0.2, 0.2, 0.2]
        ext_boxes = box_ops.enlarge_box3d(gt_boxes, extra)

        def single(pts, gts, ext, m):
            box_idx = box_ops.points_in_boxes(pts, gts[:, :7], box_mask=m)
            ext_idx = box_ops.points_in_boxes(pts, ext[:, :7], box_mask=m)
            fg = box_idx >= 0
            ignore = fg ^ (ext_idx >= 0)
            labels = jnp.where(ignore, -1, jnp.where(fg, 1, 0))
            own = jnp.clip(box_idx, 0)
            box = gts[own]                               # (V, 8)
            local = pts - box[:, :3]
            c, s = jnp.cos(-box[:, 6]), jnp.sin(-box[:, 6])
            lx = local[:, 0] * c - local[:, 1] * s
            ly = local[:, 0] * s + local[:, 1] * c
            part = jnp.stack([
                lx / jnp.clip(box[:, 3], 1e-4) + 0.5,
                ly / jnp.clip(box[:, 4], 1e-4) + 0.5,
                (local[:, 2] / jnp.clip(box[:, 5], 1e-4)) + 0.5], -1)
            part = jnp.clip(part, 0.0, 1.0)
            return labels, jnp.where(fg[:, None], part, 0.0)

        labels, part = jax.vmap(single)(points, gt_boxes, ext_boxes, gt_mask)
        if pmask is not None:
            labels = jnp.where(pmask, labels, -1)
        return {'point_cls_labels': labels, 'point_part_labels': part}

    def get_loss(self, batch: dict, targets: dict) -> tuple[jax.Array, dict]:
        labels = targets['point_cls_labels'].reshape(-1)
        cls_preds = batch['point_cls_preds'].reshape(-1, self.num_class)
        positives = labels > 0
        cls_weights = (labels >= 0).astype(jnp.float32)
        cls_weights = cls_weights / jnp.clip(
            jnp.sum(positives.astype(jnp.float32)), 1.0)
        one_hot = jnp.broadcast_to(
            jnp.where(positives[:, None], 1.0, 0.0), cls_preds.shape)
        seg_loss = jnp.sum(losses.sigmoid_focal_loss(cls_preds, one_hot,
                                                     cls_weights))
        # part regression: BCE on sigmoid outputs over foreground points
        part_preds = batch['point_part_preds'].reshape(-1, 3)
        part_tgt = targets['point_part_labels'].reshape(-1, 3)
        p = jnp.clip(jax.nn.sigmoid(part_preds), 1e-6, 1 - 1e-6)
        bce = -(part_tgt * jnp.log(p) + (1 - part_tgt) * jnp.log(1 - p))
        w = positives.astype(jnp.float32)
        part_loss = jnp.sum(bce.sum(-1) * w) / jnp.clip(jnp.sum(w), 1.0)
        total = seg_loss + part_loss
        return total, {'part_seg_loss': seg_loss, 'part_reg_loss': part_loss}
