"""Voxel feature encoders, fixed-shape.

Re-designs of `pcdet/models/backbones_3d/vfe/`:
- `MeanVFE` (`mean_vfe.py:6-31`): per-voxel mean over valid points.
- `PillarVFE` (`pillar_vfe.py:8-124`): cluster/center-offset decoration + masked
  PFN (Dense+BN+ReLU+masked-max) over the fixed (V, P, C) voxel tensor.
- `DynamicPillarVFE` (`dynamic_pillar_vfe.py` equivalent): gather-free
  scatter-add pillarization straight from raw points (`ops/pillarize.py`) —
  the TPU-native fast path (no host voxelization, no per-point gathers).

All operate on padded tensors with masks; no torch_scatter analog needed —
scatter-add + masked reductions cover it.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...ops.pillarize import pillarize
from ...utils.config import as_cfg
from ..layers import masked_max


class MeanVFE(nn.Module):
    model_cfg: Any
    num_point_features: int

    def get_output_feature_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        voxels = batch['voxels']                  # (B, V, P, C)
        num_points = batch['voxel_num_points']    # (B, V)
        P = voxels.shape[2]
        mask = jnp.arange(P)[None, None, :] < num_points[..., None]
        summed = jnp.sum(jnp.where(mask[..., None], voxels, 0.0), axis=2)
        batch['voxel_features'] = summed / jnp.clip(num_points[..., None], min=1.0)
        return batch


class PillarVFE(nn.Module):
    """Config: NUM_FILTERS, USE_NORM, WITH_DISTANCE, USE_ABSLOTE_XYZ,
    VOXEL_SIZE, POINT_CLOUD_RANGE (same schema as `pillar_vfe.py`)."""
    model_cfg: Any
    num_point_features: int
    voxel_size: Any
    point_cloud_range: Any

    def get_output_feature_dim(self):
        return as_cfg(self.model_cfg).NUM_FILTERS[-1]

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        voxels = batch['voxels']                  # (B, V, P, C)
        num_points = batch['voxel_num_points']    # (B, V)
        coords = batch['voxel_coords']            # (B, V, 3) zyx
        B, V, P, C = voxels.shape
        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.point_cloud_range[0:3]

        mask = jnp.arange(P)[None, None, :] < num_points[..., None]  # (B,V,P)
        pts_mean = jnp.sum(jnp.where(mask[..., None], voxels[..., :3], 0.0), axis=2,
                           keepdims=True) / jnp.clip(num_points[..., None, None], min=1.0)
        f_cluster = voxels[..., :3] - pts_mean

        cx = (coords[..., 2].astype(jnp.float32) + 0.5) * vx + x0
        cy = (coords[..., 1].astype(jnp.float32) + 0.5) * vy + y0
        cz = (coords[..., 0].astype(jnp.float32) + 0.5) * vz + z0
        centers = jnp.stack([cx, cy, cz], axis=-1)[:, :, None, :]
        f_center = voxels[..., :3] - centers

        feats = [voxels if cfg.get('USE_ABSLOTE_XYZ', True) else voxels[..., 3:],
                 f_cluster, f_center]
        if cfg.get('WITH_DISTANCE', False):
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(mask[..., None], x, 0.0)

        for i, ch in enumerate(cfg.NUM_FILTERS):
            x = nn.Dense(ch, use_bias=not cfg.get('USE_NORM', True),
                         name=f'pfn_{i}')(x)
            if cfg.get('USE_NORM', True):
                x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                                 epsilon=1e-3, name=f'pfn_bn_{i}')(x)
            x = nn.relu(x)
            pooled = masked_max(x, mask, axis=2)  # (B, V, ch)
            if i < len(cfg.NUM_FILTERS) - 1:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(pooled[:, :, None, :], x.shape[:3] + (ch,))],
                    axis=-1)
        batch['pillar_features'] = pooled
        return batch


class DynamicPillarVFE(nn.Module):
    """Gather-free device-side pillarization from raw points; emits the dense
    BEV canvas directly ('spatial_features'), subsuming the scatter step."""
    model_cfg: Any
    num_point_features: int
    voxel_size: Any
    point_cloud_range: Any
    grid_size: Any  # (W, H)

    def get_output_feature_dim(self):
        return self.num_point_features + 3

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        W, H = self.grid_size[0], self.grid_size[1]
        x = pillarize(batch['points'], (int(W), int(H)),
                      tuple(self.voxel_size[:2]), tuple(self.point_cloud_range),
                      mask=batch.get('points_mask'))
        batch['spatial_features'] = x
        batch['spatial_features_stride'] = 1
        return batch


_VFE = {'MeanVFE': MeanVFE, 'PillarVFE': PillarVFE, 'DynamicPillarVFE': DynamicPillarVFE}


def build_vfe(name):
    return _VFE[name]
