"""Voxel R-CNN: voxel backbone + anchor proposals + voxel grid-pool head.

Re-design of the reference `VoxelRCNN` (`pcdet/models/detectors/voxel_rcnn.py`)
on the dense TPU voxel pipeline:
    MeanVFE -> voxel backbone (dense ladder or sparse 0.05 m ladder, by NAME)
    -> BaseBEVBackbone -> AnchorHeadSingle
    -> VoxelRCNNHead (dense voxel-neighborhood grid pooling).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax

from ...utils.config import as_cfg
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_3d.vfe import MeanVFE
from ..dense_heads.anchor_head import AnchorHeadSingle
from ..roi_heads.voxelrcnn_head import VoxelRCNNHead
from .detector3d import _grid_info, build_voxel_backbone_3d
from .pv_rcnn import PVRCNN


class VoxelRCNN(PVRCNN):
    """Shares the PVRCNN driver (losses/post-process/two-stage flow); only
    the module assembly differs — no pfe/point_head, voxel grid-pool head."""

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
        self.roi_head = VoxelRCNNHead(model_cfg=cfg.ROI_HEAD,
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
