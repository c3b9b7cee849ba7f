"""CaDDN: monocular camera-only 3D detection via categorical depth.

Re-design of the reference `CaDDN` (`pcdet/models/detectors/caddn.py` +
`backbones_3d/vfe/image_vfe.py` with its DDN/FFE/F2V modules):

- image backbone (the DDN slot) produces image features; a depth head
  predicts D+1 depth-bin logits (LID discretization; the extra class is
  "beyond max range"), supervised by the DDN focal loss + fg/bg balancer
  (`ops/depth.py`) against lidar-projected depth maps;
- frustum features = depth distribution (outer) x channel features
  (`frustum_feature_extractor`);
- FrustumToVoxel: each lidar-frame voxel center projects into the image
  plane + depth bin and trilinearly samples the frustum volume — a gather,
  the TPU-native inverse of the LSS splat (`f2v/frustum_to_voxel.py`);
- HeightCompression folds z, then the standard BEV backbone + anchor head.

Batch needs 'camera_imgs' (B, 1, H, W, 3), 'trans_lidar_to_cam' (B, 4, 4),
'trans_cam_to_img' (B, 3, 4).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.config import as_cfg
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_image import ConvImageBackbone
from ..dense_heads.anchor_head import AnchorHeadSingle
from .detector3d import Detector3D, _grid_info


class CaDDN(Detector3D):

    def setup(self):
        cfg = as_cfg(self.model_cfg)
        ds = as_cfg(self.dataset_cfg)
        pc_range = tuple(ds.POINT_CLOUD_RANGE)
        (gw, gh, gd), voxel = _grid_info(ds)
        self._vox = voxel
        self._pcr = pc_range
        self._gwhd = (gw, gh, gd)

        self.image_backbone = ConvImageBackbone(model_cfg=cfg.IMAGE_BACKBONE)
        fcfg = cfg.FRUSTUM
        self.depth_bins = int(fcfg.NUM_DEPTH_BINS)
        self.depth_range = (float(fcfg.DEPTH_MIN), float(fcfg.DEPTH_MAX))
        self.frustum_channels = int(fcfg.OUT_CHANNEL)
        self.backbone_2d = BaseBEVBackbone(
            model_cfg=cfg.BACKBONE_2D,
            input_channels=self.frustum_channels * gd)
        stride = cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.get(
            'FEATURE_MAP_STRIDE', 1)
        self.dense_head = AnchorHeadSingle(
            model_cfg=cfg.DENSE_HEAD,
            input_channels=self.backbone_2d.num_bev_features,
            num_class=self.num_class, class_names=self.class_names,
            grid_size=(gw // stride, gh // stride), point_cloud_range=pc_range)
        # D+1 logits: the extra "beyond max range" class supervised by the
        # DDN loss (reference `depth_ffn.py:24` num_classes = num_bins + 1;
        # the frustum drops it after softmax, `depth_ffn.py:86-88`)
        self.depth_head = nn.Conv(
            self.depth_bins + 1 + self.frustum_channels, (1, 1),
            name='depth_head')
        self.module_list = []

    def _depth_to_bin(self, depth):
        """LID discretization (`ffe`): bin width grows linearly with depth."""
        dmin, dmax = self.depth_range
        D = self.depth_bins
        return 0.5 * (-1 + jnp.sqrt(
            1 + 8 * jnp.clip(depth - dmin, 0) * D * (D + 1)
            / (2 * (dmax - dmin))))

    def __call__(self, batch: dict, training: bool = False) -> dict:
        batch = dict(batch)
        feats = self.image_backbone(batch['camera_imgs'],
                                    training=training)[:, 0]  # (B, fH, fW, C)
        x = self.depth_head(feats)
        D, C = self.depth_bins, self.frustum_channels
        depth_logits = x[..., :D + 1]
        batch['depth_logits'] = depth_logits
        # softmax over D+1 then drop the "beyond range" bin (`depth_ffn.py:
        # 86-88`)
        depth_dist = jax.nn.softmax(depth_logits, axis=-1)[..., :D]
        ctx = x[..., D + 1:D + 1 + C]
        frustum = depth_dist[..., None] * ctx[..., None, :]  # (B,fH,fW,D,C)

        B, fH, fW, _, _ = frustum.shape
        gw, gh, gd = self._gwhd
        vx, vy, vz = self._vox
        pcr = self._pcr
        # voxel centers in lidar frame
        xs = (jnp.arange(gw) + 0.5) * vx + pcr[0]
        ys = (jnp.arange(gh) + 0.5) * vy + pcr[1]
        zs = (jnp.arange(gd) + 0.5) * vz + pcr[2]
        gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing='ij')   # (gw, gh, gd)
        centers = jnp.stack([gx, gy, gz, jnp.ones_like(gx)], -1).reshape(-1, 4)

        cam = jnp.einsum('bij,nj->bni', batch['trans_lidar_to_cam'], centers)
        img = jnp.einsum('bij,bnj->bni', batch['trans_cam_to_img'], cam)
        depth = img[..., 2]
        u = img[..., 0] / jnp.clip(depth, 1e-3)
        v = img[..., 1] / jnp.clip(depth, 1e-3)
        # image plane -> feature map coordinates
        iH, iW = batch['camera_imgs'].shape[2:4]
        fu = u * (fW / iW) - 0.5
        fv = v * (fH / iH) - 0.5
        fd = self._depth_to_bin(depth) - 0.5
        valid = (depth > self.depth_range[0]) & (u >= 0) & (u < iW) \
            & (v >= 0) & (v < iH) & (fd < D - 0.5)

        # trilinear sample of the frustum volume at (fv, fu, fd)
        flat = frustum.reshape(B, fH * fW * D, C)

        def corner(y0, x0, d0, wy, wx, wd):
            idx = (jnp.clip(y0, 0, fH - 1) * fW
                   + jnp.clip(x0, 0, fW - 1)) * D + jnp.clip(d0, 0, D - 1)
            g = jnp.take_along_axis(flat, idx[..., None], axis=1)
            return g * (wy * wx * wd)[..., None]

        y0 = jnp.floor(fv).astype(jnp.int32)
        x0 = jnp.floor(fu).astype(jnp.int32)
        d0 = jnp.floor(fd).astype(jnp.int32)
        ay = jnp.clip(fv - y0, 0, 1)
        ax = jnp.clip(fu - x0, 0, 1)
        ad = jnp.clip(fd - d0, 0, 1)
        out = 0.
        for dy in (0, 1):
            for dx in (0, 1):
                for dd in (0, 1):
                    wy = ay if dy else (1 - ay)
                    wx = ax if dx else (1 - ax)
                    wd = ad if dd else (1 - ad)
                    out = out + corner(y0 + dy, x0 + dx, d0 + dd, wy, wx, wd)
        out = jnp.where(valid[..., None], out, 0.0)     # (B, gw*gh*gd, C)
        vol = out.reshape(B, gw, gh, gd, C)
        # height compression -> (B, H, W, gd*C) with (y, x) BEV layout
        bev = jnp.transpose(vol, (0, 2, 1, 3, 4)).reshape(B, gh, gw, gd * C)
        batch['spatial_features'] = bev
        batch['spatial_features_stride'] = 1
        batch = self.backbone_2d(batch, training=training)
        batch = self.dense_head(batch, training=training)
        return batch

    def get_training_loss(self, batch: dict):
        """Detection loss + categorical depth supervision (`ddn_loss.py`):
        multi-class focal over the D+1 depth bins against lidar-projected
        depth-map targets, fg/bg-balanced by 2D gt boxes. Active whenever the
        batch carries 'depth_maps' (host pipeline step `generate_depth_map`)."""
        loss, tb = super().get_training_loss(batch)
        cfg = as_cfg(self.model_cfg)
        dcfg = cfg.get('DDN_LOSS', None)
        if 'depth_maps' in batch and dcfg is not None:
            from ...ops.depth import ddn_loss
            dm = batch['depth_maps']
            fH, fW = batch['depth_logits'].shape[1:3]
            iH, iW = batch['camera_imgs'].shape[2:4]
            factor = max(int(round(iH / fH)), 1)
            dl, dtb = ddn_loss(
                batch['depth_logits'], dm,
                batch.get('gt_boxes2d', jnp.zeros((dm.shape[0], 1, 4))),
                box_mask=batch.get('gt_boxes2d_mask'),
                weight=dcfg.get('WEIGHT', 3.0),
                alpha=dcfg.get('ALPHA', 0.25), gamma=dcfg.get('GAMMA', 2.0),
                fg_weight=dcfg.get('FG_WEIGHT', 13.0),
                bg_weight=dcfg.get('BG_WEIGHT', 1.0),
                downsample_factor=factor,
                disc_cfg={'mode': dcfg.get('MODE', 'LID'),
                          'depth_min': self.depth_range[0],
                          'depth_max': self.depth_range[1]})
            loss = loss + dl
            tb.update(dtb)
            tb['loss'] = loss
        return loss, tb
