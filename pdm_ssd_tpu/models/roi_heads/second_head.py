"""SECOND-IoU head: rotated BEV-crop IoU prediction for score rectification.

Re-design of `SECONDHead` (`pcdet/models/roi_heads/second_head.py:10-188`):
the reference crops a rotated GRID_SIZE^2 window of `spatial_features_2d`
per ROI with `affine_grid`+`grid_sample`; here the rotated lattice points are
computed directly in BEV coordinates and sampled bilinearly (four corner
row-gathers). Shared FCs predict a single IoU logit; at eval the IoU score
replaces the class confidence while the boxes stay the stage-1 boxes
(`forward:144-148`). Training regresses it to the ROI/GT IoU-derived label
(`get_box_iou_layer_loss:163-188`).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.config import as_cfg
from ..layers import FCStack, SharedMLP
from .roi_head_template import RoIHeadTemplate


def rotated_bev_crop(bev: jax.Array, rois: jax.Array, grid_size: int,
                     pc_range, voxel_size, downsample: float) -> jax.Array:
    """bev (B, H, W, C), rois (B, R, 7) -> (B, R, G, G, C): bilinear samples
    of a rotated ROI-aligned lattice (the affine_grid+grid_sample analog)."""
    B, H, W, C = bev.shape
    R = rois.shape[1]
    G = int(grid_size)
    u = (jnp.arange(G, dtype=jnp.float32) + 0.5) / G - 0.5
    gx, gy = jnp.meshgrid(u, u, indexing='ij')            # (G, G)
    lx = gx[None, None] * rois[:, :, None, None, 3]
    ly = gy[None, None] * rois[:, :, None, None, 4]
    c = jnp.cos(rois[..., 6])[..., None, None]
    s = jnp.sin(rois[..., 6])[..., None, None]
    wx = lx * c - ly * s + rois[:, :, None, None, 0]
    wy = lx * s + ly * c + rois[:, :, None, None, 1]
    fx = (wx - pc_range[0]) / (voxel_size[0] * downsample) - 0.5
    fy = (wy - pc_range[1]) / (voxel_size[1] * downsample) - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2)
    ax = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
    ay = jnp.clip(fy - y0, 0.0, 1.0)[..., None]
    flat = bev.reshape(B, H * W, C)

    def corner(dy, dx):
        idx = ((y0 + dy) * W + (x0 + dx)).reshape(B, R * G * G)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(B, R, G, G, C)

    return (corner(0, 0) * (1 - ax) * (1 - ay) + corner(0, 1) * ax * (1 - ay)
            + corner(1, 0) * (1 - ax) * ay + corner(1, 1) * ax * ay)


class SECONDHead(RoIHeadTemplate):
    """Config: ROI_GRID_POOL.{GRID_SIZE, DOWNSAMPLE_RATIO}, SHARED_FC, IOU_FC,
    NMS_CONFIG{TRAIN,TEST}, TARGET_CONFIG, LOSS_CONFIG.IOU_LOSS."""
    input_channels: int = 0
    voxel_size: tuple = (0.1, 0.1, 0.2)
    point_cloud_range: tuple = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        pool_cfg = cfg.ROI_GRID_POOL
        G = int(pool_cfg.get('GRID_SIZE', 7))

        batch = self.proposal_layer(batch, training=training)
        if training and 'gt_boxes' in batch:
            batch['roi_targets'] = self.assign_targets(batch)
        rois = batch['rois']
        B, R = rois.shape[:2]

        crop = rotated_bev_crop(
            jax.lax.stop_gradient(batch['spatial_features_2d']),
            jax.lax.stop_gradient(rois), G, self.point_cloud_range,
            self.voxel_size, float(pool_cfg.get('DOWNSAMPLE_RATIO', 8)))
        x = crop.reshape(B, R, -1)
        x = SharedMLP(tuple(cfg.get('SHARED_FC', [256, 256])),
                      name='shared_fc')(x, training=training)
        rcnn_iou = FCStack(tuple(cfg.get('IOU_FC', [256])), 1,
                           name='iou_fc')(x, training=training)
        batch['rcnn_iou_preds'] = rcnn_iou                  # (B, R, 1)
        return batch

    def get_loss(self, batch: dict, targets: dict):
        cfg = as_cfg(self.model_cfg).LOSS_CONFIG
        iou_pred = batch['rcnn_iou_preds'][..., 0].reshape(-1)
        labels = targets['rcnn_cls_labels'].reshape(-1)
        valid = (labels >= 0).astype(jnp.float32)
        kind = cfg.get('IOU_LOSS', 'BinaryCrossEntropy')
        if kind == 'BinaryCrossEntropy':
            p = jnp.clip(jax.nn.sigmoid(iou_pred), 1e-6, 1 - 1e-6)
            l = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
        elif kind == 'L2':
            l = (iou_pred - labels) ** 2
        else:  # smoothL1
            d = jnp.abs(iou_pred - labels)
            beta = 1.0 / 9.0
            l = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        loss = jnp.sum(l * valid) / jnp.clip(jnp.sum(valid), 1.0)
        w = cfg.get('LOSS_WEIGHTS', {}).get('rcnn_iou_weight', 1.0)
        loss = loss * w
        return loss, {'rcnn_loss_iou': loss}
