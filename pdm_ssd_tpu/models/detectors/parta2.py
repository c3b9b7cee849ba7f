"""Part-A2: UNet voxel backbone + part supervision + roi-aware aggregation.

Re-design of the reference `PartA2Net` (`pcdet/models/detectors/PartA2_net.py`):
    MeanVFE -> DenseUNetV2 (encoder BEV + full-res voxel-point features)
    -> BaseBEVBackbone -> AnchorHeadSingle (stage 1)
    -> PointIntraPartOffsetHead (seg + intra-part supervision)
    -> PartA2FCHead (roi-aware avg/max grid pooling refinement)
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from ...utils.config import as_cfg
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_3d.vfe import MeanVFE
from ..backbones_3d.voxel_backbone import DenseUNetV2
from ..dense_heads.anchor_head import AnchorHeadSingle
from ..dense_heads.point_intra_part_head import PointIntraPartOffsetHead
from ..roi_heads.parta2_head import PartA2FCHead
from .detector3d import _grid_info
from .pv_rcnn import PVRCNN


class PartA2Net(PVRCNN):
    """Shares the two-stage driver (losses/post-process) with PVRCNN."""

    def setup(self):
        cfg = as_cfg(self.model_cfg)
        ds = as_cfg(self.dataset_cfg)
        pc_range = tuple(ds.POINT_CLOUD_RANGE)
        num_pf = ds.get('NUM_POINT_FEATURES', 4)
        (gw, gh, gd), voxel = _grid_info(ds)

        self.vfe = MeanVFE(model_cfg=cfg.VFE, num_point_features=num_pf)
        if cfg.BACKBONE_3D.get('NAME') == 'SparseUNetV2':
            from ..backbones_3d.sparse_backbone import SparseUNetV2
            self.backbone_3d = SparseUNetV2(
                model_cfg=cfg.BACKBONE_3D, input_channels=num_pf,
                grid_size=(gw, gh, gd), voxel_size=voxel,
                point_cloud_range=pc_range)
        else:
            self.backbone_3d = DenseUNetV2(
                model_cfg=cfg.BACKBONE_3D, input_channels=num_pf,
                grid_size=(gw, gh, gd), voxel_size=voxel,
                point_cloud_range=pc_range)
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
        self.point_head = PointIntraPartOffsetHead(
            model_cfg=cfg.POINT_HEAD,
            input_channels=self.backbone_3d.num_point_features,
            num_class=1 if cfg.POINT_HEAD.get('CLASS_AGNOSTIC', True)
            else self.num_class)
        self.roi_head = PartA2FCHead(model_cfg=cfg.ROI_HEAD,
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
        batch = self.point_head(batch, training=training)
        batch = self.roi_head(batch, training=training)
        return batch
