"""BEVFusion: camera LSS branch + lidar branch fused in BEV.

Re-design of the reference `BevFusion` (`pcdet/models/detectors/bevfusion.py`):
    images -> ConvImageBackbone (Swin/FPN slot) -> DepthLSSTransform
    lidar  -> VFE -> scatter/voxel backbone -> lidar BEV
    ConvFuser(concat) -> BaseBEVBackbone -> CenterHead.

Batch needs the camera tensors ('camera_imgs' (B, N, H, W, 3),
'camera_depth', 'camera2lidar', 'camera_intrinsics') alongside the standard
lidar keys.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...utils.config import as_cfg
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_2d.map_to_bev import PointPillarScatter
from ..backbones_3d.vfe import PillarVFE
from ..backbones_image import (ConvFuser, ConvImageBackbone,
                               GeneralizedLSSFPN, SwinTransformer)
from ..dense_heads.center_head import CenterHead
from ..view_transforms.depth_lss import DepthLSSTransform
from .detector3d import Detector3D, _grid_info


class BevFusion(Detector3D):
    """Reuses the Detector3D driver (losses / post-process); the module
    assembly adds the camera branch and the fuser."""

    def setup(self):
        cfg = as_cfg(self.model_cfg)
        ds = as_cfg(self.dataset_cfg)
        pc_range = tuple(ds.POINT_CLOUD_RANGE)
        num_pf = ds.get('NUM_POINT_FEATURES', 4)
        (gw, gh, gd), voxel = _grid_info(ds)

        if cfg.IMAGE_BACKBONE.get('NAME', '') == 'SwinTransformer':
            self.image_backbone = SwinTransformer(model_cfg=cfg.IMAGE_BACKBONE)
        else:
            self.image_backbone = ConvImageBackbone(model_cfg=cfg.IMAGE_BACKBONE)
        # standalone neck (reference `GeneralizedLSSFPN`): the backbone then
        # returns its multi-scale pyramid (RETURN_PYRAMID) and the neck's
        # finest output level feeds the view transform
        self.neck = GeneralizedLSSFPN(model_cfg=cfg.NECK) \
            if cfg.get('NECK') is not None else None
        self.view_transform = DepthLSSTransform(model_cfg=cfg.VTRANSFORM)
        self.vfe = PillarVFE(model_cfg=cfg.VFE, num_point_features=num_pf,
                             voxel_size=voxel, point_cloud_range=pc_range)
        self.map_to_bev = PointPillarScatter(model_cfg=cfg.MAP_TO_BEV,
                                             grid_size=(gw, gh))
        self.fuser = ConvFuser(model_cfg=cfg.FUSER)
        self.backbone_2d = BaseBEVBackbone(
            model_cfg=cfg.BACKBONE_2D,
            input_channels=self.fuser.num_bev_features)
        stride = cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.get(
            'FEATURE_MAP_STRIDE', 1)
        self.dense_head = CenterHead(
            model_cfg=cfg.DENSE_HEAD,
            input_channels=self.backbone_2d.num_bev_features,
            num_class=self.num_class,
            grid_size=(gw // stride, gh // stride),
            point_cloud_range=pc_range, voxel_size=voxel[:2],
            class_names=tuple(self.class_names) if self.class_names else None)
        self.module_list = []

    def __call__(self, batch: dict, training: bool = False) -> dict:
        batch = dict(batch)
        # camera branch
        feats = self.image_backbone(batch['camera_imgs'], training=training)
        if self.neck is not None:
            feats = self.neck(feats, training=training)[0]
        batch['camera_feats'] = feats
        batch = self.view_transform(batch, training=training)
        camera_bev = batch['spatial_features']
        # lidar branch
        batch = self.vfe(batch, training=training)
        batch = self.map_to_bev(batch, training=training)
        lidar_bev = batch['spatial_features']
        # camera grid may differ from the lidar grid; crop/pad to match
        lh, lw = lidar_bev.shape[1:3]
        camera_bev = camera_bev[:, :lh, :lw]
        ph, pw = lh - camera_bev.shape[1], lw - camera_bev.shape[2]
        if ph or pw:
            camera_bev = jnp.pad(camera_bev,
                                 ((0, 0), (0, ph), (0, pw), (0, 0)))
        fused = self.fuser(lidar_bev, camera_bev, training=training)
        batch['spatial_features'] = fused
        batch = self.backbone_2d(batch, training=training)
        batch = self.dense_head(batch, training=training)
        return batch
