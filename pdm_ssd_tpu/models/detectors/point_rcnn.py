"""PointRCNN: point backbone -> per-point proposals -> canonical ROI refinement.

Re-design of the reference `PointRCNN` (`pcdet/models/detectors/point_rcnn.py
:4-30`) with the fixed-shape ROI stage (`models/roi_heads/`). The first stage
is the PointNet2MSG backbone + PointHeadBox proposals; the second stage pools
canonical per-ROI point sets and refines.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import iou3d
from ...utils.config import as_cfg
from ..backbones_3d.pointnet2_backbone import PointNet2MSG
from ..dense_heads.point_head_box import PointHeadBox
from ..roi_heads.pointrcnn_head import PointRCNNHead


class PointRCNN(nn.Module):
    model_cfg: Any
    num_class: int
    dataset_cfg: Any

    def setup(self):
        cfg = as_cfg(self.model_cfg)
        ds = as_cfg(self.dataset_cfg)
        pc_range = tuple(ds.POINT_CLOUD_RANGE)
        self.backbone_3d = PointNet2MSG(
            model_cfg=cfg.BACKBONE_3D,
            input_channels=ds.get('NUM_POINT_FEATURES', 4), pc_range=pc_range)
        self.point_head = PointHeadBox(
            model_cfg=cfg.POINT_HEAD,
            input_channels=self.backbone_3d.num_point_features,
            num_class=self.num_class)
        self.roi_head = PointRCNNHead(model_cfg=cfg.ROI_HEAD,
                                      num_class=self.num_class)

    def __call__(self, batch: dict, training: bool = False) -> dict:
        batch = dict(batch)
        batch = self.backbone_3d(batch, training=training)
        batch = self.point_head(batch, training=training)
        cls_preds, box_preds = self.point_head.generate_predicted_boxes(
            batch['point_coords'], batch['point_cls_preds'],
            batch['point_box_preds'])
        batch['batch_cls_preds'] = cls_preds
        batch['batch_box_preds'] = box_preds
        batch = self.roi_head(batch, training=training)
        return batch

    def forward_with_loss(self, batch: dict, training: bool = True):
        out = self(batch, training=training)
        loss, tb = self.get_training_loss(out)
        return loss, tb

    def predict(self, batch: dict) -> dict:
        out = self(batch, training=False)
        return self.post_process(out)

    def get_training_loss(self, batch: dict):
        p_targets = self.point_head.assign_targets(batch)
        p_loss, tb = self.point_head.get_loss(batch, p_targets)
        r_loss, tb2 = self.roi_head.get_loss(batch, batch['roi_targets'])
        loss = p_loss + r_loss
        tb = {**tb, **tb2, 'loss': loss}
        return loss, tb

    def post_process(self, batch: dict) -> dict:
        """Refined boxes + rcnn-score NMS, fixed shapes
        (`detector3d_template.post_processing:178-284` two-stage path)."""
        pp = as_cfg(self.model_cfg).POST_PROCESSING
        boxes, scores = self.roi_head.generate_predicted_boxes(
            batch['rois'], batch['rcnn_cls_preds'], batch['rcnn_reg_preds'])
        labels = batch['roi_labels']
        valid = batch['roi_mask'] & (scores > pp.get('SCORE_THRESH', 0.1))
        nms_cfg = pp.NMS_CONFIG

        def per_sample(b, s, l, v):
            idx, keep = iou3d.nms_bev(b, s, nms_cfg.NMS_THRESH,
                                      pre_maxsize=nms_cfg.NMS_PRE_MAXSIZE,
                                      post_maxsize=nms_cfg.NMS_POST_MAXSIZE,
                                      valid=v)
            return b[idx], s[idx] * keep, l[idx] * keep, keep

        fb, fs, fl, fm = jax.vmap(per_sample)(boxes, scores, labels, valid)
        return {'pred_boxes': fb, 'pred_scores': fs, 'pred_labels': fl,
                'pred_mask': fm}
