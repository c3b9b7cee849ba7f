"""PartA2 ROI head: roi-aware grid pooling + part-aggregation refinement.

Re-design of `PartA2FCHead` (`pcdet/models/roi_heads/partA2_head.py`):
per-ROI G^3 grids pooled from the UNet voxel-point features — part features
(seg-gated part offsets) with AVG pooling, rpn features with MAX pooling
(reference `roiaware_pool:104-152`) — then 3D conv stacks over the pooled
grids (sparse conv in the reference, dense here: the grid is tiny and fully
populated near objects) and shared FC + cls/reg branches.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roiaware import roiaware_pool
from ...utils.config import as_cfg
from ..layers import FCStack, SharedMLP
from .roi_head_template import RoIHeadTemplate


class PartA2FCHead(RoIHeadTemplate):
    """Config: ROI_AWARE_POOL.{POOL_SIZE, NUM_FEATURES, MAX_POINTS},
    SEG_MASK_SCORE_THRESH, SHARED_FC, CLS_FC, REG_FC, NMS_CONFIG,
    TARGET_CONFIG, LOSS_CONFIG."""
    input_channels: int = 0

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        pool_cfg = cfg.ROI_AWARE_POOL
        G = int(pool_cfg.get('POOL_SIZE', 12))
        P = int(pool_cfg.get('MAX_POINTS', 128))

        batch = self.proposal_layer(batch, training=training)
        if training and 'gt_boxes' in batch:
            batch['roi_targets'] = self.assign_targets(batch)
        rois = batch['rois']
        B, R = rois.shape[:2]

        pts = batch['point_coords']                       # (B, V, 3)
        rpn_feats = batch['point_features']               # (B, V, C)
        seg_score = batch['point_cls_scores']             # (B, V)
        part = batch['point_part_offset']                 # (B, V, 3)
        thresh = float(cfg.get('SEG_MASK_SCORE_THRESH', 0.3))
        gated_part = jnp.where((seg_score > thresh)[..., None], part, 0.0)
        part_feats = jnp.concatenate(
            [gated_part, seg_score[..., None]], axis=-1)  # (B, V, 4)

        pm = batch.get('point_mask')
        roi_mask = batch.get('roi_mask')
        pooled_part = roiaware_pool(pts, part_feats, rois[..., :7], G,
                                    pool='avg', num_sampled=P,
                                    roi_mask=roi_mask)
        pooled_rpn = roiaware_pool(pts, rpn_feats, rois[..., :7], G,
                                   pool='max', num_sampled=P,
                                   roi_mask=roi_mask)

        # part branch + rpn branch convs, merged (reference :56-88)
        def conv3(x, chs, name):
            for i, c in enumerate(chs):
                x = nn.Conv(c, (3, 3, 3), padding='SAME', use_bias=False,
                            name=f'{name}_conv{i}')(x)
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f'{name}_bn{i}')(x)
                x = nn.relu(x)
            return x

        cp = int(pool_cfg.get('NUM_FEATURES', 16))
        xp = conv3(pooled_part.reshape(B * R, G, G, G, -1), [cp], 'part')
        xr = conv3(pooled_rpn.reshape(B * R, G, G, G, -1), [cp], 'rpn')
        x = jnp.concatenate([xp, xr], axis=-1)
        # stride-2 conv to shrink the grid before the FCs (sparse-conv ladder
        # `partA2_head.py:conv_part/conv_rpn + shared pooling`)
        x = nn.Conv(2 * cp, (3, 3, 3), strides=(2, 2, 2), padding='SAME',
                    use_bias=False, name='down_conv')(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name='down_bn')(x)
        x = nn.relu(x)
        x = x.reshape(B, R, -1)

        x = SharedMLP(tuple(cfg.get('SHARED_FC', [256, 256])),
                      name='shared_fc')(x, training=training)
        rcnn_cls = FCStack(tuple(cfg.get('CLS_FC', [256, 256])), 1,
                           name='cls_fc')(x, training=training)
        rcnn_reg = FCStack(tuple(cfg.get('REG_FC', [256, 256])), 7,
                           name='reg_fc')(x, training=training)
        batch['rcnn_cls_preds'] = rcnn_cls
        batch['rcnn_reg_preds'] = rcnn_reg
        return batch
