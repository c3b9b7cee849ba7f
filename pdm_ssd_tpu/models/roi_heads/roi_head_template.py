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
import numpy as np

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

        # The reference runs proposal generation under `@torch.no_grad()`
        # (`roi_head_template.py:45`): stage-1 learns only from its own
        # anchor/point losses, never from refinement gradients flowing back
        # through ROI geometry (rotated-IoU target matching, canonical
        # encode divisions, grid-point lattices — all ill-conditioned).
        # Without this barrier the joint sparse PV-RCNN schedule diverges
        # (loss climbs then NaNs by ~epoch 18; BENCH_NOTES round 5).
        boxes = jax.lax.stop_gradient(batch['batch_box_preds'])     # (B, N, 7+)
        cls_preds = jax.lax.stop_gradient(batch['batch_cls_preds'])  # (B, N, nc)
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
        """ProposalTargetLayer semantics (`target_assigner/proposal_target_layer
        .py:8-228`), fixed-shape: subsample exactly ROI_PER_IMAGE rois with
        min(round(FG_RATIO*ROI_PER_IMAGE), n_fg) foregrounds, backgrounds
        split hard/easy by HARD_BG_RATIO, quota shortfalls filled by
        wraparound duplication (the reference's sampling-with-replacement).
        Randomness comes from the per-step 'targets' rng stream threaded by
        the train step."""
        cfg = as_cfg(self.model_cfg).TARGET_CONFIG
        rois = batch['rois']                   # (B, R, 7)
        roi_mask = batch['roi_mask']
        gt_boxes = batch['gt_boxes']           # (B, M, 8)
        gt_mask = batch['gt_mask']
        R = rois.shape[1]
        if rng_key is None:
            rng_key = self.make_rng('targets') if self.has_rng('targets') \
                else jax.random.PRNGKey(0)
        rand = jax.random.uniform(rng_key, roi_mask.shape)

        roi_per_image = int(cfg.get('ROI_PER_IMAGE', R))
        fg_ratio = cfg.get('FG_RATIO', 0.5)
        hard_bg_ratio = cfg.get('HARD_BG_RATIO', 0.8)
        cls_fg = cfg.get('CLS_FG_THRESH', 0.6)
        cls_bg = cfg.get('CLS_BG_THRESH', 0.45)
        reg_fg = cfg.get('REG_FG_THRESH', 0.55)
        bg_lo = cfg.get('CLS_BG_THRESH_LO', 0.1)
        fg_thresh = min(reg_fg, cls_fg)
        score_type = cfg.get('CLS_SCORE_TYPE', 'cls')

        def rank_in_group(member, rnd):
            """0-based rank of each member within its group, random order;
            non-members rank after all members."""
            key = jnp.where(member, rnd, 2.0 + rnd)
            return jnp.argsort(jnp.argsort(key))

        def single(roi, rmask, gts, gmask, rnd):
            iou = iou3d.boxes_iou3d(roi, gts[:, :7])           # (R, M)
            iou = jnp.where(gmask[None, :] & rmask[:, None], iou, -1.0)
            max_iou = jnp.maximum(jnp.max(iou, axis=1), 0.0)
            max_iou = jnp.where(rmask, max_iou, -1.0)
            gt_idx = jnp.argmax(iou, axis=1)

            fg = (max_iou >= fg_thresh) & rmask
            hard = (max_iou < reg_fg) & (max_iou >= bg_lo) & rmask
            easy = (max_iou < bg_lo) & (max_iou >= 0) & rmask
            n_fg = jnp.sum(fg)
            n_hard = jnp.sum(hard)
            n_easy = jnp.sum(easy)

            fg_quota = jnp.minimum(int(np.round(fg_ratio * roi_per_image)), n_fg)
            bg_quota = roi_per_image - fg_quota
            # reference sample_bg_inds: hard share when both pools non-empty,
            # otherwise whichever pool exists takes the whole bg quota
            hard_want = jnp.where(
                n_easy > 0, (bg_quota * hard_bg_ratio).astype(jnp.int32), bg_quota)
            hard_quota = jnp.minimum(jnp.where(n_hard > 0, hard_want, 0), n_hard)
            easy_quota = jnp.minimum(bg_quota - hard_quota, n_easy)

            sel = (fg & (rank_in_group(fg, rnd) < fg_quota)) \
                | (hard & (rank_in_group(hard, rnd) < hard_quota)) \
                | (easy & (rank_in_group(easy, rnd) < easy_quota))
            n_sel = jnp.sum(sel)
            # selected first (random order within), then wraparound-duplicate
            order = jnp.argsort(jnp.where(sel, rnd, 2.0 + rnd))
            slots = jnp.arange(roi_per_image, dtype=jnp.int32) \
                % jnp.maximum(n_sel, 1)
            out_idx = order[slots]                              # (R_out,)
            out_valid = jnp.take(sel, out_idx)

            gt_of_roi = gts[gt_idx]                             # (R, 8)
            if score_type == 'roi_iou':
                interp = (max_iou - cls_bg) / jnp.maximum(cls_fg - cls_bg, 1e-6)
                cls_label = jnp.clip(interp, 0.0, 1.0)
            elif score_type == 'raw_roi_iou':
                # SECOND-IoU: regress the raw ROI/GT IoU itself
                # (`second_net_iou` target convention)
                cls_label = jnp.clip(max_iou, 0.0, 1.0)
            else:
                cls_label = jnp.where(max_iou > cls_fg, 1.0,
                                      jnp.where(max_iou < cls_bg, 0.0, -1.0))
            return out_idx, out_valid, max_iou, gt_of_roi, cls_label, \
                (max_iou >= reg_fg) & rmask

        order, out_valid, max_iou, gt_of_roi, cls_labels, fg = jax.vmap(single)(
            rois, roi_mask, gt_boxes, gt_mask, rand)

        take = lambda t: jnp.take_along_axis(
            t, order.reshape(order.shape + (1,) * (t.ndim - 2)), axis=1)
        rois = take(rois)
        gt_of_roi = take(gt_of_roi)
        max_iou = jnp.take_along_axis(max_iou, order, axis=1)
        cls_labels = jnp.take_along_axis(cls_labels, order, axis=1)
        fg = jnp.take_along_axis(fg, order, axis=1)
        roi_mask = out_valid

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
        if 'roi_scores' in batch:
            batch['roi_scores'] = jnp.take_along_axis(
                batch['roi_scores'], order, axis=1)
        if 'roi_labels' in batch:
            batch['roi_labels'] = jnp.take_along_axis(
                batch['roi_labels'], order, axis=1)
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
        tb = {'rcnn_cls_loss': cls_loss, 'rcnn_reg_loss': reg_loss}

        if cfg.get('CORNER_LOSS_REGULARIZATION', False):
            # reference `get_box_reg_layer_loss` corner branch: decode the
            # fg refinements back to the global frame and pull their 3D
            # corners toward the matched gt's (min over flipped heading)
            rois = targets['rois']
            boxes, _ = self.generate_predicted_boxes(
                rois, batch['rcnn_cls_preds'], reg_preds)
            B, R = rois.shape[:2]
            per_roi = losses.corner_loss_lidar(
                boxes.reshape(B * R, 7),
                targets['gt_of_roi'][..., :7].reshape(B * R, 7)
            ).reshape(B, R)
            m = reg_mask.astype(per_roi.dtype)
            corner = jnp.sum(per_roi * m) / jnp.clip(jnp.sum(m), min=1.0)
            corner = corner * lw.get('rcnn_corner_weight', 1.0)
            total = total + corner
            tb['rcnn_corner_loss'] = corner
        return total, tb

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
