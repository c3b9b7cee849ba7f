"""Post-processing NMS dispatch — fixed-shape analog of
`pcdet/models/model_utils/model_nms_utils.py`.

All functions are per-sample (callers vmap over the batch) and return
(boxes (P, 7), scores (P,), labels (P,), keep (P,)) with static P:
- `class_agnostic_nms` (:6-26): one rotated/circle NMS over all candidates.
- `multi_classes_nms` (:28-67): per-class NMS over per-class score columns;
  P = num_class * NMS_POST_MAXSIZE.
- `class_specific_nms` (:69-108): per-class NMS over labeled candidates with
  per-class thresholds; P = sum(NMS_POST_MAXSIZE[k]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import iou3d
from ..ops.selection import two_stage_topk


def _as_list(v, n):
    if isinstance(v, (list, tuple)):
        return list(v)
    return [v] * n


def class_agnostic_nms(boxes, scores, labels, valid, nms_cfg):
    """boxes (A, 7), scores/labels/valid (A,)."""
    if nms_cfg.get('NMS_TYPE', 'nms_bev') == 'circle_nms':
        idx, keep = iou3d.circle_nms(
            boxes, scores, nms_cfg.get('NMS_RADIUS', 1.0),
            pre_maxsize=nms_cfg.NMS_PRE_MAXSIZE,
            post_maxsize=nms_cfg.NMS_POST_MAXSIZE, valid=valid)
    else:
        idx, keep = iou3d.nms_bev(
            boxes, scores, nms_cfg.NMS_THRESH,
            pre_maxsize=nms_cfg.NMS_PRE_MAXSIZE,
            post_maxsize=nms_cfg.NMS_POST_MAXSIZE, valid=valid)
    return boxes[idx], scores[idx] * keep, labels[idx] * keep, keep


def multi_classes_nms(cls_probs, boxes, nms_cfg, score_thresh=None):
    """Per-class column NMS (`model_nms_utils.multi_classes_nms:28-67`).

    cls_probs: (A, num_class) sigmoid scores; boxes: (A, 7).
    Labels are 1-based. Classes run as a static python loop (num_class is
    small); each contributes NMS_POST boxes (masked by keep).
    """
    num_class = cls_probs.shape[-1]
    threshs = _as_list(nms_cfg.NMS_THRESH, num_class)
    pres = _as_list(nms_cfg.NMS_PRE_MAXSIZE, num_class)
    posts = _as_list(nms_cfg.NMS_POST_MAXSIZE, num_class)
    out_b, out_s, out_l, out_k = [], [], [], []
    for k in range(num_class):
        s = cls_probs[:, k]
        v = jnp.ones_like(s, bool) if score_thresh is None else s >= score_thresh
        # pre-select the top candidates for this class (fixed-shape)
        kk = min(pres[k] * 2, s.shape[0])
        top_s, sel = two_stage_topk(jnp.where(v, s, -1.0)[None], kk)
        top_s, sel = top_s[0], sel[0]
        b = boxes[sel]
        vv = top_s > (0.0 if score_thresh is None else score_thresh)
        idx, keep = iou3d.nms_bev(b, top_s, threshs[k], pre_maxsize=pres[k],
                                  post_maxsize=posts[k], valid=vv)
        out_b.append(b[idx])
        out_s.append(top_s[idx] * keep)
        out_l.append((k + 1) * keep)
        out_k.append(keep)
    return (jnp.concatenate(out_b, 0), jnp.concatenate(out_s, 0),
            jnp.concatenate(out_l, 0), jnp.concatenate(out_k, 0))


def class_specific_nms(boxes, scores, labels, valid, nms_cfg, num_class,
                       score_thresh=None):
    """Per-class NMS over labeled candidates
    (`model_nms_utils.class_specific_nms:69-108`). labels are 1-based."""
    threshs = _as_list(nms_cfg.NMS_THRESH, num_class)
    pres = _as_list(nms_cfg.NMS_PRE_MAXSIZE, num_class)
    posts = _as_list(nms_cfg.NMS_POST_MAXSIZE, num_class)
    sth = _as_list(score_thresh, num_class) if score_thresh is not None else None
    out_b, out_s, out_l, out_k = [], [], [], []
    for k in range(num_class):
        v = valid & (labels == k + 1)
        if sth is not None:
            v = v & (scores > sth[k])
        idx, keep = iou3d.nms_bev(boxes, scores, threshs[k],
                                  pre_maxsize=pres[k], post_maxsize=posts[k],
                                  valid=v)
        out_b.append(boxes[idx])
        out_s.append(scores[idx] * keep)
        out_l.append((k + 1) * keep)
        out_k.append(keep)
    return (jnp.concatenate(out_b, 0), jnp.concatenate(out_s, 0),
            jnp.concatenate(out_l, 0), jnp.concatenate(out_k, 0))


def dispatch_nms(boxes, scores, labels, valid, nms_cfg, num_class,
                 cls_probs=None, score_thresh=None):
    """Select the NMS flavor from config (NMS_TYPE / MULTI_CLASSES_NMS)."""
    nms_type = nms_cfg.get('NMS_TYPE', 'nms_bev')
    if nms_type == 'multi_classes_nms':
        assert cls_probs is not None
        return multi_classes_nms(cls_probs, boxes, nms_cfg, score_thresh)
    if nms_type == 'class_specific_nms':
        return class_specific_nms(boxes, scores, labels, valid, nms_cfg,
                                  num_class, score_thresh)
    return class_agnostic_nms(boxes, scores, labels, valid, nms_cfg)
