"""PDM-SSD detector: point backbone -> PDM neck -> BEV conv -> hybrid head.

The flagship single-stage detector (paper spec in reference `README.md:12`;
assembly pattern follows `Detector3DTemplate.build_networks`,
`pcdet/models/detectors/detector3d_template.py:23-173`, with the module
topology [backbone_3d, point_head(vote), pdm_neck, backbone_2d, dense_head]).

Everything runs under jit with fixed shapes; the mutable-batch_dict idiom of the
reference becomes a pure dict-in/dict-out pipeline. Post-processing (hybrid
fusion + rotated NMS) returns fixed-size padded detections + validity masks.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.config import as_cfg
from .. import model_nms
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_2d.pdm_neck import PDMNeck
from ..backbones_2d.pdm_neck_conv import PDMNeckConv
from ..backbones_3d.pointnet2_backbone import PointNet2MSG
from ..backbones_3d.grid_point_backbone import GridPointBackbone
from ..dense_heads.center_head import CenterHead
from ..dense_heads.point_head_box import PointHeadBox
from ..dense_heads.point_head_simple import PointHeadSimple


class PDMSSD(nn.Module):
    model_cfg: Any
    num_class: int
    dataset_cfg: Any
    class_names: Any = None

    def setup(self):
        cfg = as_cfg(self.model_cfg)
        ds_cfg = as_cfg(self.dataset_cfg)
        pc_range = ds_cfg.POINT_CLOUD_RANGE
        num_point_features = ds_cfg.get('NUM_POINT_FEATURES', 4)

        bb_name = cfg.BACKBONE_3D.get('NAME', 'PointNet2MSG')
        if bb_name == 'GridPointBackbone':
            self.backbone_3d = GridPointBackbone(
                model_cfg=cfg.BACKBONE_3D, input_channels=num_point_features,
                pc_range=tuple(pc_range))
        else:
            self.backbone_3d = PointNet2MSG(model_cfg=cfg.BACKBONE_3D,
                                            input_channels=num_point_features,
                                            pc_range=tuple(pc_range))
        if cfg.get('POINT_HEAD') is not None:
            head_cls = {'PointHeadBox': PointHeadBox,
                        'PointHeadSimple': PointHeadSimple}[cfg.POINT_HEAD.NAME]
            self.point_head = head_cls(
                model_cfg=cfg.POINT_HEAD,
                input_channels=self.backbone_3d.num_point_features,
                num_class=self.num_class if not cfg.POINT_HEAD.get('CLASS_AGNOSTIC', False) else 1)
        else:
            self.point_head = None

        if cfg.get('PDM_NECK') is not None:
            neck_cfg = cfg.PDM_NECK
            if 'POINT_CLOUD_RANGE' not in neck_cfg:
                neck_cfg['POINT_CLOUD_RANGE'] = pc_range
            if neck_cfg.get('NAME', 'PDMNeck') == 'PDMNeckConv':
                self.pdm_neck = PDMNeckConv(model_cfg=neck_cfg, input_channels=0)
            else:
                self.pdm_neck = PDMNeck(model_cfg=neck_cfg, input_channels=0)
            self.backbone_2d = BaseBEVBackbone(
                model_cfg=cfg.BACKBONE_2D,
                input_channels=self.pdm_neck.num_bev_features)
            self.dense_head = CenterHead(
                model_cfg=cfg.DENSE_HEAD,
                input_channels=self.backbone_2d.num_bev_features,
                num_class=self.num_class,
                grid_size=tuple(neck_cfg.BEV_SIZE),
                point_cloud_range=tuple(pc_range),
                voxel_size=tuple(neck_cfg.VOXEL_SIZE[:2]),
                class_names=tuple(self.class_names) if self.class_names else None)
        else:
            self.pdm_neck = None
            self.backbone_2d = None
            self.dense_head = None

    def __call__(self, batch: dict, training: bool = False) -> dict:
        batch = dict(batch)
        batch = self.backbone_3d(batch, training=training)
        if self.point_head is not None:
            batch = self.point_head(batch, training=training)
        if self.pdm_neck is not None:
            batch = self.pdm_neck(batch, training=training)
            batch = self.backbone_2d(batch, training=training)
            batch = self.dense_head(batch, training=training)
        return batch

    def forward_with_loss(self, batch: dict, training: bool = True):
        """Single-apply train path: forward + target assignment + losses.
        Returns (loss, (tb_dict, out_batch)) — shaped for jax.value_and_grad."""
        out = self(batch, training=training)
        loss, tb = self.get_training_loss(out)
        return loss, tb

    def predict(self, batch: dict) -> dict:
        """Single-apply eval path: forward + hybrid post-processing.

        POST_PROCESSING.TTA_FLIP (e.g. ['y']) enables flip test-time
        augmentation — the point-model analog of the reference's DOUBLE_FLIP
        voxelization TTA (`data_processor.py:133`, consumed by CenterPoint):
        the model runs on the flipped cloud in-graph, flipped detections are
        mirrored back, and one joint NMS merges the variants."""
        pp = as_cfg(self.model_cfg).POST_PROCESSING
        flips = list(pp.get('TTA_FLIP', []))
        out = self(batch, training=False)
        det = self.post_process(out)
        if not flips:
            return det
        dets = [det]
        for axis in flips:
            assert axis in ('x', 'y'), axis
            col = 0 if axis == 'x' else 1
            fb = dict(batch)
            pts = batch['points']
            fb['points'] = pts.at[..., col].multiply(-1.0)
            fdet = self.post_process(self(fb, training=False))
            fboxes = fdet['pred_boxes'].at[..., col].multiply(-1.0)
            # mirroring flips the heading: y-flip: th -> -th; x-flip: th -> pi - th
            if axis == 'y':
                fboxes = fboxes.at[..., 6].multiply(-1.0)
            else:
                fboxes = fboxes.at[..., 6].set(jnp.pi - fboxes[..., 6])
            fdet = {**fdet, 'pred_boxes': fboxes}
            dets.append(fdet)

        boxes = jnp.concatenate([d['pred_boxes'] for d in dets], axis=1)
        scores = jnp.concatenate([d['pred_scores'] for d in dets], axis=1)
        labels = jnp.concatenate([d['pred_labels'] for d in dets], axis=1)
        valid = jnp.concatenate([d['pred_mask'] for d in dets], axis=1)
        nms_cfg = pp.NMS_CONFIG

        def per_sample(b, s, l, v):
            from ...ops import iou3d
            idx, keep = iou3d.nms_bev(b, s, nms_cfg.NMS_THRESH,
                                      pre_maxsize=nms_cfg.NMS_PRE_MAXSIZE,
                                      post_maxsize=nms_cfg.NMS_POST_MAXSIZE,
                                      valid=v)
            return b[idx], s[idx] * keep, l[idx] * keep, keep

        fb_, fs_, fl_, fm_ = jax.vmap(per_sample)(boxes, scores, labels, valid)
        return {'pred_boxes': fb_, 'pred_scores': fs_, 'pred_labels': fl_,
                'pred_mask': fm_}

    # ---- losses (pure; called through nn.apply-bound methods or directly) ----

    def get_training_loss(self, batch: dict) -> tuple[jax.Array, dict]:
        tb: dict = {}
        loss = jnp.asarray(0.0, jnp.float32)
        if self.point_head is not None:
            targets = self.point_head.assign_targets(batch)
            l, t = self.point_head.get_loss(batch, targets)
            loss, tb = loss + l, {**tb, **t}
        if self.dense_head is not None:
            H, W = batch['spatial_features_2d'].shape[1:3]
            targets = self.dense_head.assign_targets(
                batch['gt_boxes'], batch['gt_mask'], (H, W))
            l, t = self.dense_head.get_loss(batch, targets)
            loss, tb = loss + l, {**tb, **t}
        tb['loss'] = loss
        return loss, tb

    # ---- post-processing ----

    def post_process(self, batch: dict) -> dict:
        """Hybrid-head fusion + class-agnostic rotated NMS, fixed shapes.

        - heatmap branch: fixed-K decode from the CenterHead.
        - vote branch: per-point decoded boxes with sigmoid scores, top-K' picked.
        - score calibration: heatmap scores are rectified with the best nearby
          vote score (geometric mean), the paper's "calibrate box scores via
          feature fusion"; vote boxes complement the candidate set.
        - final: joint NMS (`model_nms_utils.class_agnostic_nms:6-26` analog).
        Returns dict with (B, P, 7+) boxes, (B, P) scores/labels/mask.
        """
        pp = as_cfg(self.model_cfg).POST_PROCESSING
        cands = []

        if self.dense_head is not None:
            hm = self.dense_head.generate_predicted_boxes(batch)
            hm_boxes, hm_scores = hm['pred_boxes'], hm['pred_scores']
            hm_labels, hm_mask = hm['pred_labels'] + 1, hm['pred_mask']
            if self.point_head is not None and pp.get('SCORE_CALIBRATION', True):
                pts = batch['point_coords']                # (B, N, 3)
                vote_scores = batch['point_cls_scores']    # (B, N)
                d2 = jnp.sum((hm_boxes[:, :, None, :2] - pts[:, None, :, :2]) ** 2, axis=-1)
                radius = pp.get('CALIBRATION_RADIUS', 1.0)
                near = d2 < radius * radius
                s = jnp.where(near, vote_scores[:, None, :], 0.0)
                best_vote = jnp.max(s, axis=-1)            # (B, K)
                alpha = pp.get('CALIBRATION_ALPHA', 0.5)
                hm_scores = hm_scores ** (1 - alpha) * jnp.maximum(best_vote, hm_scores) ** alpha
            cands.append((hm_boxes, hm_scores, hm_labels, hm_mask))

        if self.point_head is not None and getattr(self.point_head, 'box_coder', None) \
                and pp.get('USE_VOTE_BOXES', True) and 'point_box_preds' in batch:
            cls_preds, boxes = self.point_head.generate_predicted_boxes(
                batch['point_coords'], batch['point_cls_preds'], batch['point_box_preds'])
            scores = jax.nn.sigmoid(jnp.max(cls_preds, axis=-1))
            labels = jnp.argmax(cls_preds, axis=-1) + 1
            K = min(pp.get('VOTE_TOPK', 256), scores.shape[1])
            top_scores, top_idx = jax.lax.top_k(scores, K)
            take = lambda t: jnp.take_along_axis(
                t, top_idx.reshape(top_idx.shape + (1,) * (t.ndim - 2)), axis=1)
            cands.append((take(boxes), top_scores, take(labels[..., None])[..., 0],
                          jnp.ones_like(top_scores, bool)))

        boxes = jnp.concatenate([c[0][..., :7] for c in cands], axis=1)
        scores = jnp.concatenate([c[1] for c in cands], axis=1)
        labels = jnp.concatenate([c[2] for c in cands], axis=1)
        valid = jnp.concatenate([c[3] for c in cands], axis=1)

        thresh = pp.get('SCORE_THRESH', 0.1)
        valid = valid & (scores > thresh)
        nms_cfg = pp.NMS_CONFIG
        nms_type = nms_cfg.get('NMS_TYPE', 'nms_bev')

        def per_sample(b, s, l, v):
            return model_nms.dispatch_nms(
                b, s, l, v, nms_cfg, self.num_class,
                score_thresh=thresh if nms_type == 'class_specific_nms' else None)

        fb, fs, fl, fm = jax.vmap(per_sample)(boxes, scores, labels, valid)
        return {'pred_boxes': fb, 'pred_scores': fs, 'pred_labels': fl, 'pred_mask': fm}


_DETECTORS = {'PDMSSD': PDMSSD}


def build_detector(model_cfg, num_class, dataset_cfg):
    return _DETECTORS[model_cfg.NAME](model_cfg=model_cfg, num_class=num_class,
                                      dataset_cfg=dataset_cfg)
