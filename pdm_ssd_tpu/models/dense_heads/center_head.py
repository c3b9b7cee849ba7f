"""CenterPoint-style heatmap head (the scene-heatmap branch of the hybrid head).

Re-design of `CenterHead` (`pcdet/models/dense_heads/center_head.py:49-416`)
in NHWC with fixed-shape outputs. Supports the reference's multi-head class
grouping (`CLASS_NAMES_EACH_HEAD`, `center_head.py:49-104`): one SeparateHead
per group with its own heatmap channels, per-head target assignment, losses
and decode, labels remapped to global class ids. Optional 'iou' branch with
the IoU-prediction loss and DIoU regression loss
(`pcdet/utils/loss_utils.py:610-648`) and score rectification at decode
(`center_head.py:320-324`).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

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
    class_names: Any = None  # global class-name list (for multi-head mapping)

    def _groups(self):
        """List over heads of global class ids (1-based) in that head."""
        cfg = as_cfg(self.model_cfg)
        groups_cfg = cfg.get('CLASS_NAMES_EACH_HEAD', None)
        if not groups_cfg or self.class_names is None:
            return [list(range(1, self.num_class + 1))]
        name_to_id = {n: i + 1 for i, n in enumerate(self.class_names)}
        return [[name_to_id[n] for n in grp if n in name_to_id]
                for grp in groups_cfg]

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        x = batch['spatial_features_2d']  # (B, H, W, C)
        shared = nn.Conv(cfg.SHARED_CONV_CHANNEL, (3, 3), padding=1,
                         use_bias=False, name='shared_conv')(x)
        shared = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                              epsilon=1e-5, name='shared_bn')(shared)
        shared = nn.relu(shared)

        groups = self._groups()
        preds_list = []
        for gi, group in enumerate(groups):
            head_dict = {k: dict(v) for k, v in cfg.SEPARATE_HEAD_CFG.HEAD_DICT.items()}
            head_dict['hm'] = dict(out_channels=len(group),
                                   num_conv=cfg.get('NUM_HM_CONV', 2))
            name = 'head' if len(groups) == 1 else f'head_{gi}'
            preds_list.append(SeparateHead(head_dict=head_dict, name=name)(
                shared, training=training))
        batch['center_head_preds'] = preds_list
        return batch

    # ---- pure functions ----

    def assign_targets(self, gt_boxes: jax.Array, gt_mask: jax.Array,
                       feature_map_size) -> list[dict]:
        """Per-head Gaussian heatmap target assignment (`center_head.py:106-227`).
        feature_map_size: (H, W). Returns one target dict per head group."""
        cfg = as_cfg(self.model_cfg).TARGET_ASSIGNER_CONFIG
        H, W = feature_map_size
        out = []
        for group in self._groups():
            gids = jnp.asarray(group, jnp.int32)                 # (nc_head,)
            cls_g = gt_boxes[..., -1].astype(jnp.int32)          # (B, M) global 1-based
            in_group = jnp.any(cls_g[..., None] == gids[None, None], axis=-1)
            # remap to 1-based index within the group
            local = jnp.argmax(cls_g[..., None] == gids[None, None], axis=-1) + 1
            gts = jnp.concatenate(
                [gt_boxes[..., :-1],
                 jnp.where(in_group, local, 0).astype(gt_boxes.dtype)[..., None]],
                axis=-1)
            m = gt_mask & in_group

            def single(g, mm, n_cls=len(group)):
                return centernet.assign_center_targets(
                    g, mm, num_classes=n_cls, feature_map_size=(W, H),
                    feature_map_stride=cfg.FEATURE_MAP_STRIDE,
                    voxel_size=self.voxel_size,
                    point_cloud_range=self.point_cloud_range,
                    num_max_objs=g.shape[0],
                    gaussian_overlap=cfg.GAUSSIAN_OVERLAP,
                    min_radius=cfg.MIN_RADIUS)

            heatmaps, ret_boxes, inds, masks, src = jax.vmap(single)(gts, m)
            out.append({'heatmaps': heatmaps, 'target_boxes': ret_boxes,
                        'inds': inds, 'masks': masks, 'target_boxes_src': src})
        return out

    def get_loss(self, batch: dict, targets) -> tuple[jax.Array, dict]:
        mcfg = as_cfg(self.model_cfg)
        preds_list = batch['center_head_preds']
        if isinstance(targets, dict):
            targets = [targets]
        lw = mcfg.LOSS_CONFIG.LOSS_WEIGHTS
        order = mcfg.SEPARATE_HEAD_CFG.HEAD_ORDER
        total = jnp.asarray(0.0, jnp.float32)
        tb = {}
        for idx, (preds, tgt) in enumerate(zip(preds_list, targets)):
            hm = jnp.clip(jax.nn.sigmoid(preds['hm']), 1e-4, 1 - 1e-4)
            hm_loss = losses.centernet_focal_loss(
                hm.transpose(0, 3, 1, 2), tgt['heatmaps']) * lw['cls_weight']

            pred_boxes = jnp.concatenate([preds[k] for k in order], axis=-1)
            B, H, W, D = pred_boxes.shape
            gathered = losses.gather_feat(pred_boxes.reshape(B, H * W, D),
                                          tgt['inds'])
            reg = losses.centernet_reg_loss(gathered, tgt['masks'],
                                            tgt['target_boxes'])
            loc_loss = jnp.sum(reg * jnp.asarray(lw['code_weights'])) * lw['loc_weight']
            total = total + hm_loss + loc_loss
            sfx = f'_head_{idx}' if len(preds_list) > 1 else ''
            tb[f'hm_loss{sfx}'] = hm_loss
            tb[f'loc_loss{sfx}'] = loc_loss

            if 'iou' in preds or mcfg.get('IOU_REG_LOSS', False):
                decoded = centernet.decode_boxes_at_inds(
                    preds, tgt['inds'], self.point_cloud_range, self.voxel_size,
                    mcfg.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE, (W, H))
                if 'iou' in preds:
                    iou_flat = preds['iou'].reshape(B, H * W, 1)
                    iou_g = losses.gather_feat(iou_flat, tgt['inds'])[..., 0]
                    iou_loss = losses.centerhead_iou_loss(
                        iou_g, decoded, tgt['masks'], tgt['target_boxes_src'])
                    total = total + iou_loss
                    tb[f'iou_loss{sfx}'] = iou_loss
                if mcfg.get('IOU_REG_LOSS', False):
                    iou_reg = losses.centerhead_iou_reg_loss(
                        decoded, tgt['masks'], tgt['target_boxes_src']) \
                        * lw['loc_weight']
                    total = total + iou_reg
                    tb[f'iou_reg_loss{sfx}'] = iou_reg
        return total, tb

    def generate_predicted_boxes(self, batch: dict) -> dict:
        """Fixed-K decode per head (`center_head.py:296-365`): top-K over each
        head's heatmap, labels remapped to global class ids, optional IoU score
        rectification; results concatenated over heads. NMS is applied by the
        detector post-processing."""
        mcfg = as_cfg(self.model_cfg)
        pp = mcfg.POST_PROCESSING
        preds_list = batch['center_head_preds']
        groups = self._groups()

        def nchw(t):
            return t.transpose(0, 3, 1, 2)

        outs = []
        for preds, group in zip(preds_list, groups):
            dec = centernet.decode_bbox_from_heatmap(
                heatmap=nchw(jax.nn.sigmoid(preds['hm'])),
                rot_cos=nchw(preds['rot'][..., 0:1]),
                rot_sin=nchw(preds['rot'][..., 1:2]),
                center=nchw(preds['center']),
                center_z=nchw(preds['center_z']),
                dim=nchw(jnp.exp(jnp.clip(preds['dim'], -5.0, 5.0))),
                vel=nchw(preds['vel']) if 'vel' in preds else None,
                iou=nchw((preds['iou'] + 1) * 0.5) if 'iou' in preds else None,
                point_cloud_range=self.point_cloud_range, voxel_size=self.voxel_size,
                feature_map_stride=mcfg.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE,
                K=pp.MAX_OBJ_PER_SAMPLE, score_thresh=pp.get('SCORE_THRESH'),
                post_center_limit_range=pp.POST_CENTER_LIMIT_RANGE)
            # local (0-based) -> global (0-based) class ids
            mapping = jnp.asarray(np.asarray(group, np.int32) - 1)
            dec['pred_labels'] = mapping[dec['pred_labels']]
            if pp.get('USE_IOU_TO_RECTIFY_SCORE', False) and 'pred_iou' in dec:
                pred_iou = jnp.clip(dec['pred_iou'], 0.0, 1.0)
                rect = jnp.asarray(pp.IOU_RECTIFIER)[dec['pred_labels']]
                dec['pred_scores'] = dec['pred_scores'] ** (1 - rect) \
                    * pred_iou ** rect
            outs.append(dec)

        keys = ['pred_boxes', 'pred_scores', 'pred_labels', 'pred_mask']
        return {k: jnp.concatenate([o[k] for o in outs], axis=1) for k in keys}
