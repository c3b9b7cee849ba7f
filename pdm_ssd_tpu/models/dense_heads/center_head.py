"""CenterPoint-style heatmap head (the scene-heatmap branch of the hybrid head).

Re-design of `CenterHead` (`pcdet/models/dense_heads/center_head.py:49-416`)
in NHWC with fixed-shape outputs. Single task-head group (KITTI 3-class); the
multi-head grouping of the reference collapses to one SeparateHead here, with
the same channel layout: hm / center / center_z / dim / rot.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import centernet, losses
from ...utils.config import as_cfg


class SeparateHead(nn.Module):
    """Per-branch conv stacks (`center_head.py:12-46`); 'hm' final bias -2.19."""
    head_dict: dict  # name -> {out_channels, num_conv}
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, training: bool = False) -> dict:
        out = {}
        for name, spec in self.head_dict.items():
            h = x
            for k in range(spec['num_conv'] - 1):
                h = nn.Conv(x.shape[-1], (3, 3), padding=1, use_bias=False,
                            name=f'{name}_conv{k}')(h)
                h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                                 epsilon=1e-5, name=f'{name}_bn{k}')(h)
                h = nn.relu(h)
            bias = self.init_bias if name == 'hm' else 0.0
            h = nn.Conv(spec['out_channels'], (3, 3), padding=1, use_bias=True,
                        bias_init=nn.initializers.constant(bias),
                        name=f'{name}_out')(h)
            out[name] = h
        return out


class CenterHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    grid_size: Any          # (W, H)
    point_cloud_range: Any
    voxel_size: Any

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        x = batch['spatial_features_2d']  # (B, H, W, C)
        shared = nn.Conv(cfg.SHARED_CONV_CHANNEL, (3, 3), padding=1,
                         use_bias=False, name='shared_conv')(x)
        shared = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                              epsilon=1e-5, name='shared_bn')(shared)
        shared = nn.relu(shared)

        head_dict = {k: dict(v) for k, v in cfg.SEPARATE_HEAD_CFG.HEAD_DICT.items()}
        head_dict['hm'] = dict(out_channels=self.num_class,
                               num_conv=cfg.get('NUM_HM_CONV', 2))
        preds = SeparateHead(head_dict=head_dict, name='head')(shared, training=training)
        batch['center_head_preds'] = preds
        return batch

    # ---- pure functions ----

    def assign_targets(self, gt_boxes: jax.Array, gt_mask: jax.Array,
                       feature_map_size) -> dict:
        """Batched Gaussian heatmap target assignment (`center_head.py:106-227`).
        feature_map_size: (H, W)."""
        cfg = as_cfg(self.model_cfg).TARGET_ASSIGNER_CONFIG
        H, W = feature_map_size

        def single(gts, m):
            return centernet.assign_center_targets(
                gts, m, num_classes=self.num_class, feature_map_size=(W, H),
                feature_map_stride=cfg.FEATURE_MAP_STRIDE,
                voxel_size=self.voxel_size, point_cloud_range=self.point_cloud_range,
                num_max_objs=gts.shape[0],
                gaussian_overlap=cfg.GAUSSIAN_OVERLAP, min_radius=cfg.MIN_RADIUS)

        heatmaps, ret_boxes, inds, masks = jax.vmap(single)(gt_boxes, gt_mask)
        return {'heatmaps': heatmaps, 'target_boxes': ret_boxes,
                'inds': inds, 'masks': masks}

    def get_loss(self, batch: dict, targets: dict) -> tuple[jax.Array, dict]:
        mcfg = as_cfg(self.model_cfg)
        preds = batch['center_head_preds']
        hm = jnp.clip(jax.nn.sigmoid(preds['hm']), 1e-4, 1 - 1e-4)  # (B,H,W,C)
        hm_nchw = hm.transpose(0, 3, 1, 2)
        hm_loss = losses.centernet_focal_loss(hm_nchw, targets['heatmaps'])
        lw = mcfg.LOSS_CONFIG.LOSS_WEIGHTS
        hm_loss = hm_loss * lw['cls_weight']

        order = mcfg.SEPARATE_HEAD_CFG.HEAD_ORDER
        pred_boxes = jnp.concatenate([preds[k] for k in order], axis=-1)  # (B,H,W,D)
        B, H, W, D = pred_boxes.shape
        flat = pred_boxes.reshape(B, H * W, D)
        gathered = losses.gather_feat(flat, targets['inds'])  # (B, K, D)
        reg = losses.centernet_reg_loss(gathered, targets['masks'],
                                        targets['target_boxes'])  # (D,)
        loc_loss = jnp.sum(reg * jnp.asarray(lw['code_weights'])) * lw['loc_weight']
        total = hm_loss + loc_loss
        return total, {'hm_loss': hm_loss, 'loc_loss': loc_loss}

    def generate_predicted_boxes(self, batch: dict) -> dict:
        """Fixed-K decode (`center_head.py:297-365`): top-K over the heatmap,
        gather regression channels, range/score masking. NMS is applied by the
        detector post-processing."""
        mcfg = as_cfg(self.model_cfg)
        pp = mcfg.POST_PROCESSING
        preds = batch['center_head_preds']

        def nchw(t):
            return t.transpose(0, 3, 1, 2)

        return centernet.decode_bbox_from_heatmap(
            heatmap=nchw(jax.nn.sigmoid(preds['hm'])),
            rot_cos=nchw(preds['rot'][..., 0:1]),
            rot_sin=nchw(preds['rot'][..., 1:2]),
            center=nchw(preds['center']),
            center_z=nchw(preds['center_z']),
            dim=nchw(jnp.exp(jnp.clip(preds['dim'], -5.0, 5.0))),
            point_cloud_range=self.point_cloud_range, voxel_size=self.voxel_size,
            feature_map_stride=mcfg.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE,
            K=pp.MAX_OBJ_PER_SAMPLE, score_thresh=pp.get('SCORE_THRESH'),
            post_center_limit_range=pp.POST_CENTER_LIMIT_RANGE)
