"""SECOND-IoU: SECOND with an IoU-rectification second stage.

Re-design of the reference `SECONDNetIoU`
(`pcdet/models/detectors/second_net_iou.py`): stage 1 is the dense-voxel
SECOND; the `SECONDHead` predicts a per-ROI IoU which rectifies the stage-1
confidence at post-processing (score^(1-a) * iou^a with SCORE_WEIGHT /
IOU_WEIGHT), boxes unchanged.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.config import as_cfg
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_3d.vfe import MeanVFE
from ..dense_heads.anchor_head import AnchorHeadSingle
from ..roi_heads.second_head import SECONDHead
from .detector3d import _grid_info, build_voxel_backbone_3d
from .pv_rcnn import PVRCNN


class SECONDNetIoU(PVRCNN):

    def setup(self):
        cfg = as_cfg(self.model_cfg)
        ds = as_cfg(self.dataset_cfg)
        pc_range = tuple(ds.POINT_CLOUD_RANGE)
        num_pf = ds.get('NUM_POINT_FEATURES', 4)
        (gw, gh, gd), voxel = _grid_info(ds)

        self.vfe = MeanVFE(model_cfg=cfg.VFE, num_point_features=num_pf)
        self.backbone_3d = build_voxel_backbone_3d(
            cfg.BACKBONE_3D, num_pf, (gw, gh, gd),
            voxel_size=voxel, pc_range=pc_range)
        self.backbone_2d = BaseBEVBackbone(
            model_cfg=cfg.BACKBONE_2D,
            input_channels=self.backbone_3d.num_bev_features)
        stride = cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.get(
            'FEATURE_MAP_STRIDE', 8)
        self.dense_head = AnchorHeadSingle(
            model_cfg=cfg.DENSE_HEAD,
            input_channels=self.backbone_2d.num_bev_features,
            num_class=self.num_class, class_names=self.class_names,
            grid_size=(gw // stride, gh // stride), point_cloud_range=pc_range)
        self.pfe = None
        self.point_head = None
        self.roi_head = SECONDHead(model_cfg=cfg.ROI_HEAD,
                                   num_class=self.num_class,
                                   voxel_size=voxel,
                                   point_cloud_range=pc_range)

    def __call__(self, batch: dict, training: bool = False) -> dict:
        batch = dict(batch)
        batch = self.vfe(batch, training=training)
        batch = self.backbone_3d(batch, training=training)
        batch = self.backbone_2d(batch, training=training)
        batch = self.dense_head(batch, training=training)
        cls_preds, box_preds = self.dense_head.generate_predicted_boxes(batch)
        batch['batch_cls_preds'] = cls_preds
        batch['batch_box_preds'] = box_preds
        batch = self.roi_head(batch, training=training)
        return batch

    def post_process(self, batch: dict) -> dict:
        """IoU-rectified scoring (`second_net_iou.post_processing` pattern):
        final score = roi_score^(1-w) * sigmoid(iou)^w, boxes = stage-1 rois."""
        pp = as_cfg(self.model_cfg).POST_PROCESSING
        w = float(pp.get('IOU_RECTIFIER', 0.71))
        rois = batch['rois']
        roi_scores = jnp.clip(batch['roi_scores'], 1e-6, 1.0)
        iou = jnp.clip(jax.nn.sigmoid(batch['rcnn_iou_preds'][..., 0]), 1e-6)
        scores = roi_scores ** (1 - w) * iou ** w
        labels = batch['roi_labels']
        valid = batch['roi_mask'] & (scores > pp.get('SCORE_THRESH', 0.1))
        nms_cfg = pp.NMS_CONFIG
        from ...ops import iou3d as iou_ops

        def per_sample(b, s, l, v):
            idx, keep = iou_ops.nms_bev(b, s, nms_cfg.NMS_THRESH,
                                        pre_maxsize=nms_cfg.NMS_PRE_MAXSIZE,
                                        post_maxsize=nms_cfg.NMS_POST_MAXSIZE,
                                        valid=v)
            return b[idx], s[idx] * keep, l[idx] * keep, keep

        fb, fs, fl, fm = jax.vmap(per_sample)(rois[..., :7], scores, labels,
                                              valid)
        return {'pred_boxes': fb, 'pred_scores': fs, 'pred_labels': fl,
                'pred_mask': fm}

    def get_training_loss(self, batch: dict):
        a_targets = self.dense_head.assign_targets(batch)
        loss, tb = self.dense_head.get_loss(batch, a_targets)
        r_loss, tb3 = self.roi_head.get_loss(batch, batch['roi_targets'])
        loss = loss + r_loss
        tb = {**tb, **tb3, 'loss': loss}
        return loss, tb
