"""Two-stage ROI refinement template, fixed-shape.

Re-design of `RoIHeadTemplate` (`pcdet/models/roi_heads/roi_head_template.py`)
and `ProposalTargetLayer` (`target_assigner/proposal_target_layer.py:8-228`)
for XLA's static-shape world:

- `proposal_layer` (:45-102): class-agnostic NMS over first-stage boxes into
  exactly NUM_ROIS slots + validity mask (no dynamic keep lists).
- `assign_targets` (:104-140 + proposal_target_layer): ROI/GT 3D-IoU matching
  with stratified fg / hard-bg / easy-bg subsampling done by priority-key
  top-k (fg ratio and counts preserved in expectation, shapes static).
- canonical-frame regression targets: gt transformed into each ROI's frame
  and encoded against the ROI dims (`roi_head_template.py` canonical
  transform), heading wrapped to [-pi/4, 3pi/4) like the reference coder.
- losses: BCE on IoU-derived cls labels, smooth-L1 on canonical residuals,
  optional corner loss; decode back to global frame.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import box_ops, iou3d, losses
from ...ops.coders import ResidualCoder
from ...utils.config import as_cfg


class RoIHeadTemplate(nn.Module):
    model_cfg: Any
    num_class: int

    # ---------- proposals ----------

    def proposal_layer(self, batch: dict, training: bool) -> dict:
        cfg = as_cfg(self.model_cfg).NMS_CONFIG
        mode = 'TRAIN' if training else 'TEST'
        pre = cfg[mode].NMS_PRE_MAXSIZE
        post = cfg[mode].NMS_POST_MAXSIZE
        thresh = cfg[mode].NMS_THRESH

        boxes = batch['batch_box_preds']       # (B, N, 7+)
        cls_preds = batch['batch_cls_preds']   # (B, N, nc)
        scores = jnp.max(jax.nn.sigmoid(cls_preds), axis=-1)
        labels = jnp.argmax(cls_preds, axis=-1) + 1

        def per_sample(b, s, l):
            idx, keep = iou3d.nms_bev(b[:, :7], s, thresh,
                                      pre_maxsize=pre, post_maxsize=post)
            return b[idx][:, :7], s[idx] * keep, l[idx] * keep, keep

        rois, roi_scores, roi_labels, roi_mask = jax.vmap(per_sample)(
            boxes, scores, labels)
        batch['rois'] = rois                   # (B, R, 7)
        batch['roi_scores'] = roi_scores
        batch['roi_labels'] = roi_labels
        batch['roi_mask'] = roi_mask
        return batch

    # ---------- targets ----------

    def assign_targets(self, batch: dict, rng_key=None) -> dict:
        cfg = as_cfg(self.model_cfg).TARGET_CONFIG
        rois = batch['rois']                   # (B, R, 7)
        roi_mask = batch['roi_mask']
        gt_boxes = batch['gt_boxes']           # (B, M, 8)
        gt_mask = batch['gt_mask']
        R = rois.shape[1]
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        rand = jax.random.uniform(rng_key, roi_mask.shape)

        fg_thresh = cfg.get('CLS_FG_THRESH', 0.6)
        bg_thresh = cfg.get('CLS_BG_THRESH', 0.45)
        reg_fg = cfg.get('REG_FG_THRESH', 0.55)
        hard_bg = cfg.get('CLS_BG_THRESH_LO', 0.1)

        def single(roi, rmask, gts, gmask, rnd):
            iou = iou3d.boxes_iou3d(roi, gts[:, :7])           # (R, M)
            iou = jnp.where(gmask[None, :] & rmask[:, None], iou, -1.0)
            max_iou = jnp.max(iou, axis=1)
            gt_idx = jnp.argmax(iou, axis=1)
            fg = max_iou >= reg_fg
            # stratified priority: fg first, then hard bg, then easy bg
            prio = jnp.where(fg, 2.0 + rnd,
                             jnp.where(max_iou >= hard_bg, 1.0 + rnd, rnd))
            prio = jnp.where(rmask, prio, -1.0)
            order = jnp.argsort(-prio)                          # all R kept (R == ROI_PER_IMAGE)
            gt_of_roi = gts[gt_idx]                             # (R, 8)
            cls_label = jnp.where(max_iou >= fg_thresh, 1.0,
                                  jnp.where(max_iou < bg_thresh, 0.0, -1.0))
            return order, max_iou, gt_of_roi, cls_label, fg

        order, max_iou, gt_of_roi, cls_labels, fg = jax.vmap(single)(
            rois, roi_mask, gt_boxes, gt_mask, rand)

        take = lambda t: jnp.take_along_axis(
            t, order.reshape(order.shape + (1,) * (t.ndim - 2)), axis=1)
        rois = take(rois)
        gt_of_roi = take(gt_of_roi)
        max_iou = jnp.take_along_axis(max_iou, order, axis=1)
        cls_labels = jnp.take_along_axis(cls_labels, order, axis=1)
        fg = jnp.take_along_axis(fg, order, axis=1)
        roi_mask = jnp.take_along_axis(batch['roi_mask'], order, axis=1)

        # canonical-frame regression targets (roi frame, roi as anchor)
        local_gt = gt_of_roi[..., :7]
        shift = local_gt[..., :3] - rois[..., :3]
        B, R = rois.shape[:2]
        shift = box_ops.rotate_points_along_z(
            shift.reshape(B * R, 1, 3), -rois[..., 6].reshape(B * R)).reshape(B, R, 3)
        local_heading = box_ops.limit_period(
            local_gt[..., 6] - rois[..., 6], offset=0.5, period=2 * jnp.pi)
        canonical_gt = jnp.concatenate(
            [shift, local_gt[..., 3:6], local_heading[..., None]], axis=-1)
        canonical_roi = jnp.concatenate(
            [jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
             jnp.zeros_like(rois[..., 6:7])], axis=-1)
        coder = ResidualCoder()
        reg_targets = coder.encode(canonical_gt, canonical_roi)

        batch['rois'] = rois
        batch['roi_mask'] = roi_mask
        return {
            'rois': rois, 'roi_mask': roi_mask, 'gt_of_roi': gt_of_roi,
            'rcnn_cls_labels': cls_labels, 'rcnn_reg_targets': reg_targets,
            'reg_valid_mask': fg & roi_mask, 'roi_ious': max_iou,
        }

    # ---------- losses ----------

    def get_loss(self, batch: dict, targets: dict):
        cfg = as_cfg(self.model_cfg).LOSS_CONFIG
        lw = cfg.LOSS_WEIGHTS
        cls_preds = batch['rcnn_cls_preds'][..., 0]             # (B, R)
        cls_labels = targets['rcnn_cls_labels']
        care = cls_labels >= 0
        bce = losses.sigmoid_bce_with_logits(cls_preds, jnp.clip(cls_labels, 0, 1))
        cls_loss = jnp.sum(bce * care) / jnp.clip(jnp.sum(care), min=1.0)
        cls_loss = cls_loss * lw['rcnn_cls_weight']

        reg_preds = batch['rcnn_reg_preds']                     # (B, R, 7)
        reg_mask = targets['reg_valid_mask']
        reg_loss = losses.weighted_smooth_l1(
            reg_preds, targets['rcnn_reg_targets'],
            reg_mask.astype(jnp.float32), code_weights=lw.get('code_weights'))
        reg_loss = jnp.sum(reg_loss) / jnp.clip(jnp.sum(reg_mask), min=1.0)
        reg_loss = reg_loss * lw['rcnn_reg_weight']
        total = cls_loss + reg_loss
        return total, {'rcnn_cls_loss': cls_loss, 'rcnn_reg_loss': reg_loss}

    # ---------- decode ----------

    def generate_predicted_boxes(self, rois, rcnn_cls, rcnn_reg):
        """Canonical residual decode back to global frame
        (`roi_head_template.generate_predicted_boxes`)."""
        coder = ResidualCoder()
        B, R = rois.shape[:2]
        canonical_roi = jnp.concatenate(
            [jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
             jnp.zeros_like(rois[..., 6:7])], axis=-1)
        local = coder.decode(rcnn_reg, canonical_roi)           # (B, R, 7)
        center = box_ops.rotate_points_along_z(
            local[..., :3].reshape(B * R, 1, 3),
            rois[..., 6].reshape(B * R)).reshape(B, R, 3) + rois[..., :3]
        heading = local[..., 6] + rois[..., 6]
        boxes = jnp.concatenate(
            [center, local[..., 3:6], heading[..., None]], axis=-1)
        scores = jax.nn.sigmoid(rcnn_cls[..., 0])
        return boxes, scores
