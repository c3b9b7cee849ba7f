"""Point-wise box head (the vote branch of the hybrid head).

Re-design of `PointHeadBox` (`pcdet/models/dense_heads/point_head_box.py:7-115`)
and the target assignment / losses of `PointHeadTemplate`
(`pcdet/models/dense_heads/point_head_template.py:49-191`) in batched fixed
shapes: points are (B, N, 3), labels (B, N). The points-in-boxes CUDA test is
replaced by the vectorized rotation test from `ops.box_ops`.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import box_ops, losses
from ...ops.coders import build_box_coder
from ...utils.config import as_cfg
from ..layers import FCStack


class PointHeadBox(nn.Module):
    """Predicts per-point class logits + box residuals.

    Config schema mirrors the reference: CLS_FC, REG_FC, CLASS_AGNOSTIC,
    TARGET_CONFIG.{GT_EXTRA_WIDTH, BOX_CODER, BOX_CODER_CONFIG},
    LOSS_CONFIG.LOSS_WEIGHTS.
    """
    model_cfg: Any
    input_channels: int
    num_class: int

    def box_coder(self):
        tc = as_cfg(self.model_cfg).TARGET_CONFIG
        return build_box_coder(tc.BOX_CODER, **tc.get('BOX_CODER_CONFIG', {}).to_dict())

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        feats = batch['point_features']  # (B, N, C)
        cls_preds = FCStack(tuple(cfg.CLS_FC), self.num_class,
                            name='cls_layers')(feats, training=training)
        box_preds = FCStack(tuple(cfg.REG_FC), self.box_coder().code_size,
                            name='box_layers')(feats, training=training)
        batch['point_cls_preds'] = cls_preds
        batch['point_box_preds'] = box_preds
        batch['point_cls_scores'] = jax.nn.sigmoid(jnp.max(cls_preds, axis=-1))
        return batch

    # ---- pure functions (no params) ----

    def assign_targets(self, batch: dict) -> dict:
        """Batched `assign_stack_targets` (`point_head_template.py:49-129`) with
        set_ignore_flag=True: fg label from containing gt box, ignore (-1) for
        points only inside the extra-width-enlarged box."""
        points = batch['point_coords']          # (B, N, 3)
        gt_boxes = batch['gt_boxes']            # (B, M, 8) cls in last col
        gt_mask = batch.get('gt_mask')          # (B, M) bool
        if gt_mask is None:
            gt_mask = jnp.any(gt_boxes[..., 3:6] > 0, axis=-1)
        extra = as_cfg(self.model_cfg).TARGET_CONFIG.get('GT_EXTRA_WIDTH', [0.2, 0.2, 0.2])
        ext_boxes = box_ops.enlarge_box3d(gt_boxes, extra)

        def single(pts, gts, ext, m):
            box_idx = box_ops.points_in_boxes(pts, gts[:, :7], box_mask=m)
            ext_idx = box_ops.points_in_boxes(pts, ext[:, :7], box_mask=m)
            fg = box_idx >= 0
            ignore = fg ^ (ext_idx >= 0)
            gt_of_pt = gts[jnp.clip(box_idx, 0, None)]
            if self.num_class == 1:
                labels = jnp.where(fg, 1, 0)
            else:
                labels = jnp.where(fg, gt_of_pt[:, -1].astype(jnp.int32), 0)
            labels = jnp.where(ignore, -1, labels)
            enc = self.box_coder().encode(gt_of_pt[:, :-1], pts,
                                          gt_of_pt[:, -1].astype(jnp.int32))
            box_labels = jnp.where(fg[:, None], enc, 0.0)
            return labels, box_labels

        labels, box_labels = jax.vmap(single)(points, gt_boxes, ext_boxes, gt_mask)
        return {'point_cls_labels': labels, 'point_box_labels': box_labels}

    def get_loss(self, batch: dict, targets: dict) -> tuple[jax.Array, dict]:
        """Focal cls + weighted smooth-L1 box losses
        (`point_head_template.py:131-191`)."""
        labels = targets['point_cls_labels'].reshape(-1)          # (BN,)
        cls_preds = batch['point_cls_preds'].reshape(-1, self.num_class)
        positives = labels > 0
        negatives = labels == 0
        cls_weights = (positives + negatives).astype(jnp.float32)
        pos_norm = jnp.sum(positives.astype(jnp.float32))
        cls_weights = cls_weights / jnp.clip(pos_norm, min=1.0)
        one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), self.num_class + 1)[..., 1:]
        cls_loss = jnp.sum(losses.sigmoid_focal_loss(cls_preds, one_hot, cls_weights))

        box_preds = batch['point_box_preds'].reshape(-1, batch['point_box_preds'].shape[-1])
        box_labels = targets['point_box_labels'].reshape(-1, box_preds.shape[-1])
        reg_weights = positives.astype(jnp.float32) / jnp.clip(pos_norm, min=1.0)
        lw = as_cfg(self.model_cfg).LOSS_CONFIG.LOSS_WEIGHTS
        box_loss = jnp.sum(losses.weighted_smooth_l1(
            box_preds[None], box_labels[None], reg_weights[None],
            code_weights=lw.get('code_weights')))

        total = cls_loss * lw['point_cls_weight'] + box_loss * lw['point_box_weight']
        tb = {'point_loss_cls': cls_loss, 'point_loss_box': box_loss,
              'point_pos_num': pos_norm}
        return total, tb

    def generate_predicted_boxes(self, points: jax.Array, cls_preds: jax.Array,
                                 box_preds: jax.Array):
        """Decode per-point boxes (`point_head_template.py:193-207`)."""
        pred_classes = jnp.argmax(cls_preds, axis=-1)
        boxes = self.box_coder().decode(box_preds, points, pred_classes + 1)
        return cls_preds, boxes
