"""Voxel R-CNN ROI head: voxel-neighborhood grid pooling + refinement.

Re-design of `pcdet/models/roi_heads/voxelrcnn_head.py` (which pools
multi-scale sparse voxel features around ROI grid points through the
voxel-hash query, `voxel_query_gpu.cu` + `voxel_pool_modules.py:8`): on the
dense TPU pipeline each ROI spawns a GRID_SIZE^3 lattice and every grid point
aggregates a 3x3x3 dense-volume neighborhood per configured scale
(`VoxelNeighborAgg` — occupancy-masked offsets-conditioned MLP + max-pool),
then shared FCs + cls/reg branches from `RoIHeadTemplate`.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.config import as_cfg
from ..backbones_3d.pfe import (VoxelNeighborAgg, SparseVoxelNeighborAgg,
                                sparse_stage_dims)
from ..layers import FCStack, SharedMLP
from .roi_head_template import RoIHeadTemplate
from .pvrcnn_head import dense_grid_points


class VoxelRCNNHead(RoIHeadTemplate):
    """Config: GRID_SIZE, ROI_GRID_POOL.{FEATURES_SOURCE, MLPS (per source)},
    SHARED_FC, CLS_FC, REG_FC, NMS_CONFIG{TRAIN,TEST}, TARGET_CONFIG,
    LOSS_CONFIG. Needs batch['multi_scale_3d_features'] from the dense voxel
    backbone plus voxel_size / point_cloud_range fields."""
    input_channels: int = 0
    voxel_size: tuple = (0.1, 0.1, 0.2)
    point_cloud_range: tuple = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        pool_cfg = cfg.ROI_GRID_POOL
        g = int(cfg.get('GRID_SIZE', 6))
        G3 = g ** 3

        batch = self.proposal_layer(batch, training=training)
        if training and 'gt_boxes' in batch:
            batch['roi_targets'] = self.assign_targets(batch)
        rois = batch['rois']
        B, R = rois.shape[:2]

        grid = dense_grid_points(rois, g).reshape(B, R * G3, 3)

        feats = []
        for src in pool_cfg.FEATURES_SOURCE:
            scfg = pool_cfg[src]
            mlp = [int(c) for c in scfg.MLPS]
            if 'multi_scale_3d_features' in batch:
                vol, occ, stride = batch['multi_scale_3d_features'][src]
                feats.append(VoxelNeighborAgg(
                    mlp=mlp, downsample=int(stride),
                    voxel_size=self.voxel_size,
                    pc_range=self.point_cloud_range,
                    name=f'agg_{src}')(vol, occ, grid, training=training))
            else:
                # sparse ladder (the reference's native 0.05 m regime):
                # pool through the slot-ID-grid voxel query
                f, co, mk, stride = \
                    batch['multi_scale_3d_features_sparse'][src]
                feats.append(SparseVoxelNeighborAgg(
                    mlp=mlp, downsample=int(stride),
                    voxel_size=self.voxel_size,
                    pc_range=self.point_cloud_range,
                    dims=sparse_stage_dims(self.point_cloud_range,
                                           self.voxel_size, stride),
                    name=f'agg_{src}')(f, co, mk, grid, training=training))
        pooled = jnp.concatenate(feats, axis=-1)          # (B, R*G3, SC)
        x = pooled.reshape(B, R, G3 * pooled.shape[-1])
        x = SharedMLP(tuple(cfg.get('SHARED_FC', [256, 256])),
                      name='shared_fc')(x, training=training)
        rcnn_cls = FCStack(tuple(cfg.get('CLS_FC', [256, 256])), 1,
                           name='cls_fc')(x, training=training)
        rcnn_reg = FCStack(tuple(cfg.get('REG_FC', [256, 256])), 7,
                           name='reg_fc')(x, training=training)
        batch['rcnn_cls_preds'] = rcnn_cls
        batch['rcnn_reg_preds'] = rcnn_reg
        return batch
