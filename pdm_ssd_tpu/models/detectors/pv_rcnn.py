"""PV-RCNN: voxel backbone + anchor proposals + keypoint VSA + grid-pool head.

Re-design of the reference `PVRCNN` (`pcdet/models/detectors/pv_rcnn.py`) on
the dense TPU voxel pipeline. Topology (per
`detector3d_template.build_networks`, reference :23-173):

    MeanVFE -> DenseVoxelBackBone8x (multi-scale volumes + height compression)
    -> BaseBEVBackbone -> AnchorHeadSingle (stage 1)
    -> VoxelSetAbstraction (keypoints)
    -> PointHeadSimple (keypoint segmentation aux, train only)
    -> PVRCNNHead (keypoint grid pooling refinement)
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import iou3d
from ...utils.config import as_cfg
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_3d.pfe import VoxelSetAbstraction
from ..backbones_3d.vfe import MeanVFE
from ..dense_heads.anchor_head import AnchorHeadSingle
from ..dense_heads.point_head_simple import PointHeadSimple
from ..roi_heads.pvrcnn_head import PVRCNNHead
from .detector3d import _grid_info, build_voxel_backbone_3d


class PVRCNN(nn.Module):
    model_cfg: Any
    num_class: int
    dataset_cfg: Any
    class_names: Any = None

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
            model_cfg=cfg.DENSE_HEAD, input_channels=self.backbone_2d.num_bev_features,
            num_class=self.num_class, class_names=self.class_names,
            grid_size=(gw // stride, gh // stride), point_cloud_range=pc_range)
        self.pfe = VoxelSetAbstraction(
            model_cfg=cfg.PFE, voxel_size=voxel, point_cloud_range=pc_range,
            num_bev_features=self.backbone_3d.num_bev_features,
            num_rawpoint_features=num_pf)
        if cfg.get('POINT_HEAD') is not None:
            self.point_head = PointHeadSimple(
                model_cfg=cfg.POINT_HEAD,
                input_channels=cfg.PFE.NUM_OUTPUT_FEATURES, num_class=1)
        else:
            self.point_head = None
        self.roi_head = PVRCNNHead(model_cfg=cfg.ROI_HEAD,
                                   num_class=self.num_class)

    def __call__(self, batch: dict, training: bool = False) -> dict:
        batch = dict(batch)
        batch = self.vfe(batch, training=training)
        batch = self.backbone_3d(batch, training=training)
        batch = self.backbone_2d(batch, training=training)
        batch = self.dense_head(batch, training=training)
        cls_preds, box_preds = self.dense_head.generate_predicted_boxes(batch)
        batch['batch_cls_preds'] = cls_preds
        batch['batch_box_preds'] = box_preds
        batch = self.pfe(batch, training=training)
        if self.point_head is not None:
            batch = self.point_head(batch, training=training)
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
        a_targets = self.dense_head.assign_targets(batch)
        loss, tb = self.dense_head.get_loss(batch, a_targets)
        if self.point_head is not None:
            p_targets = self.point_head.assign_targets(batch)
            p_loss, tb2 = self.point_head.get_loss(batch, p_targets)
            loss, tb = loss + p_loss, {**tb, **tb2}
        r_loss, tb3 = self.roi_head.get_loss(batch, batch['roi_targets'])
        loss = loss + r_loss
        tb = {**tb, **tb3, 'loss': loss}
        return loss, tb

    def post_process(self, batch: dict) -> dict:
        """Refined boxes + rcnn-score NMS (two-stage path of
        `detector3d_template.post_processing:178-284`)."""
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
