"""Map-to-BEV modules.

Re-designs of `pcdet/models/backbones_2d/map_to_bev/`:
- `PointPillarScatter` (`pointpillar_scatter.py:14-38`): pillar features ->
  dense BEV canvas; the reference's index_put becomes a one-shot scatter-add
  (valid pillars carry disjoint cells, so add == set).
- `HeightCompression` (`height_compression.py:10-26`): fold the z dim of a
  dense 3D feature volume into channels.
- `Conv2DCollapse`: 1x1-conv collapse of (z, C) -> C_out.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.config import as_cfg


class PointPillarScatter(nn.Module):
    model_cfg: Any
    grid_size: Any  # (W, H[, D])

    @property
    def num_bev_features(self):
        return as_cfg(self.model_cfg).NUM_BEV_FEATURES

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        feats = batch['pillar_features']          # (B, V, C)
        coords = batch['voxel_coords']            # (B, V, 3) zyx
        mask = batch.get('voxel_mask')            # (B, V) or None
        W, H = int(self.grid_size[0]), int(self.grid_size[1])
        ncells = H * W
        iy = coords[..., 1].astype(jnp.int32)
        ix = coords[..., 2].astype(jnp.int32)
        ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        if mask is not None:
            ok = ok & mask
        flat = jnp.where(ok, iy * W + ix, ncells)

        def one(fl, f):
            canvas = jnp.zeros((ncells + 1, f.shape[-1]), f.dtype)
            return canvas.at[fl].add(f)[:ncells]

        canvas = jax.vmap(one)(flat, jnp.where(ok[..., None], feats, 0.0))
        batch['spatial_features'] = canvas.reshape(feats.shape[0], H, W, -1)
        batch['spatial_features_stride'] = 1
        return batch


class HeightCompression(nn.Module):
    model_cfg: Any

    @property
    def num_bev_features(self):
        return as_cfg(self.model_cfg).NUM_BEV_FEATURES

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        x = batch['dense_voxel_features']  # (B, D, H, W, C) or (B, H, W, D, C)
        if x.ndim == 5:
            if 'voxel_layout' in batch and batch['voxel_layout'] == 'DHWC':
                x = jnp.moveaxis(x, 1, 3)  # -> (B, H, W, D, C)
            B, H, W, D, C = x.shape
            x = x.reshape(B, H, W, D * C)
        batch['spatial_features'] = x
        return batch


class Conv2DCollapse(nn.Module):
    model_cfg: Any

    @property
    def num_bev_features(self):
        return as_cfg(self.model_cfg).NUM_BEV_FEATURES

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        x = batch['dense_voxel_features']
        if x.ndim == 5:
            B, H, W, D, C = x.shape
            x = x.reshape(B, H, W, D * C)
        cfg = as_cfg(self.model_cfg)
        x = nn.Conv(cfg.NUM_BEV_FEATURES, (1, 1), use_bias=False, name='collapse')(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3, name='bn')(x)
        batch['spatial_features'] = nn.relu(x)
        return batch
