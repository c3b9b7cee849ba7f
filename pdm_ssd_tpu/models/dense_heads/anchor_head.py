"""Anchor-based dense head family (SECOND / PointPillars parity).

Re-designs of the reference anchor stack:
- `AnchorGenerator` (`target_assigner/anchor_generator.py:4-79`): dense
  meshgrid anchors per class/size/rotation, precomputed in numpy.
- `AxisAlignedTargetAssigner` (`target_assigner/axis_aligned_target_assigner.py
  :8-210`): per-class IoU matching with matched/unmatched thresholds and
  force-matching of the best anchor per gt — vectorized over the whole anchor
  grid (no per-gt python loops); IoU is nearest-BEV axis-aligned
  (`box_utils.boxes3d_nearest_bev_iou:328`).
- `AnchorHeadSingle` (`anchor_head_single.py` + template `anchor_head_template
  .py:37-272`): 1x1 conv cls/box/dir branches, sigmoid-focal cls loss,
  sin-difference smooth-L1 box loss, direction-bin CE, box decode with
  dir-bin snap.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import losses
from ...ops.box_ops import limit_period
from ...ops.coders import ResidualCoder
from ...utils.config import as_cfg


def generate_anchors(anchor_cfg_list, grid_size, point_cloud_range):
    """Returns anchors (A, 7) float32 and per-class slices; anchors ordered
    [class][y][x][size=1][rot]. grid_size: (W, H) of the feature map.

    Grid convention matches the reference `AnchorGenerator`
    (`target_assigner/anchor_generator.py:20-45`): by default
    (`align_center` False) positions span the range ENDPOINT-INCLUSIVE with
    stride (max-min)/(n-1); `align_center: True` uses cell centers with
    stride (max-min)/n. The convention moves every anchor by up to half a
    cell — assignment and box decode depend on it, so it must match for
    checkpoint/output parity (caught by the round-4 SECOND train-loss
    parity test)."""
    W, H = grid_size
    x0, y0 = point_cloud_range[0], point_cloud_range[1]
    x1, y1 = point_cloud_range[3], point_cloud_range[4]
    all_anchors = []
    class_slices = []
    ofs = 0
    for cfg in anchor_cfg_list:
        sizes = np.array(cfg['anchor_sizes'], np.float32)        # (S, 3)
        rots = np.array(cfg['anchor_rotations'], np.float32)     # (R,)
        heights = np.array(cfg['anchor_bottom_heights'], np.float32)
        if cfg.get('align_center', False):
            stride_x = (x1 - x0) / W
            stride_y = (y1 - y0) / H
            xs = x0 + (np.arange(W) + 0.5) * stride_x
            ys = y0 + (np.arange(H) + 0.5) * stride_y
        else:
            stride_x = (x1 - x0) / max(W - 1, 1)
            stride_y = (y1 - y0) / max(H - 1, 1)
            xs = np.arange(x0, x1 + 1e-5, stride_x, dtype=np.float32)[:W]
            ys = np.arange(y0, y1 + 1e-5, stride_y, dtype=np.float32)[:H]
        gy, gx = np.meshgrid(ys, xs, indexing='ij')              # (H, W)
        n_cells = H * W
        S, R = len(sizes), len(rots)
        a = np.zeros((n_cells, S, R, 7), np.float32)
        a[..., 0] = gx.reshape(-1, 1, 1)
        a[..., 1] = gy.reshape(-1, 1, 1)
        a[..., 2] = heights[0] + sizes[None, :, None, 2] / 2.0   # center z
        a[..., 3:6] = sizes[None, :, None, :]
        a[..., 6] = rots[None, None, :]
        a = a.reshape(-1, 7)
        all_anchors.append(a)
        class_slices.append((ofs, ofs + len(a)))
        ofs += len(a)
    return np.concatenate(all_anchors, axis=0), class_slices


def nearest_bev_iou(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Axis-aligned BEV IoU after snapping headings to the nearest axis
    (`box_utils.boxes3d_nearest_bev_iou:328`). boxes: (N, 7)."""
    def to_bev(b):
        rot = jnp.abs(limit_period(b[:, 6], 0.5, jnp.pi))
        swap = rot > jnp.pi / 4
        dx = jnp.where(swap, b[:, 4], b[:, 3])
        dy = jnp.where(swap, b[:, 3], b[:, 4])
        return jnp.stack([b[:, 0] - dx / 2, b[:, 1] - dy / 2,
                          b[:, 0] + dx / 2, b[:, 1] + dy / 2], axis=-1)

    a = to_bev(boxes_a)
    b = to_bev(boxes_b)
    iw = (jnp.minimum(a[:, None, 2], b[None, :, 2])
          - jnp.maximum(a[:, None, 0], b[None, :, 0]))
    ih = (jnp.minimum(a[:, None, 3], b[None, :, 3])
          - jnp.maximum(a[:, None, 1], b[None, :, 1]))
    inter = jnp.clip(iw, min=0) * jnp.clip(ih, min=0)
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / jnp.clip(area_a + area_b - inter, min=1e-6)


class AnchorHeadSingle(nn.Module):
    """Config mirrors the reference: ANCHOR_GENERATOR_CONFIG (list per class),
    TARGET_ASSIGNER_CONFIG{NAME, MATCH_HEIGHT, BOX_CODER...}, LOSS_CONFIG,
    USE_DIRECTION_CLASSIFIER, DIR_OFFSET, DIR_LIMIT_OFFSET, NUM_DIR_BINS."""
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Any
    grid_size: Any            # feature-map (W, H)
    point_cloud_range: Any

    def _anchors(self):
        cfg = as_cfg(self.model_cfg)
        anchors, slices = generate_anchors(
            [c.to_dict() if hasattr(c, 'to_dict') else dict(c)
             for c in cfg.ANCHOR_GENERATOR_CONFIG],
            tuple(self.grid_size), tuple(self.point_cloud_range))
        return jnp.asarray(anchors), slices

    def _coder(self):
        return ResidualCoder()

    @property
    def num_anchors_per_location(self):
        cfg = as_cfg(self.model_cfg)
        n = 0
        for c in cfg.ANCHOR_GENERATOR_CONFIG:
            n += len(c['anchor_sizes']) * len(c['anchor_rotations'])
        return n

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        x = batch['spatial_features_2d']          # (B, H, W, C)
        na = self.num_anchors_per_location
        code = self._coder().code_size
        cls_preds = nn.Conv(na * self.num_class, (1, 1), name='conv_cls',
                            bias_init=nn.initializers.constant(-float(np.log((1 - 0.01) / 0.01)))
                            )(x)
        box_preds = nn.Conv(na * code, (1, 1), name='conv_box')(x)
        B, H, W, _ = cls_preds.shape
        # anchor order is [class(size)][y][x][rot]; conv output is [y][x][class*rot]
        # -> reorder to anchor-major (class, y, x, rot)
        n_cls_groups = len(cfg.ANCHOR_GENERATOR_CONFIG)
        n_rot = na // n_cls_groups
        def to_anchor_major(t, ch):
            t = t.reshape(B, H, W, n_cls_groups, n_rot, ch)
            t = jnp.transpose(t, (0, 3, 1, 2, 4, 5))
            return t.reshape(B, -1, ch)
        batch['anchor_cls_preds'] = to_anchor_major(cls_preds, self.num_class)
        batch['anchor_box_preds'] = to_anchor_major(box_preds, code)
        # raw NHWC conv maps (oracle-parity surface, tests/test_full_model_parity)
        batch['anchor_cls_preds_map'] = cls_preds
        batch['anchor_box_preds_map'] = box_preds
        if cfg.get('USE_DIRECTION_CLASSIFIER', True):
            dir_preds = nn.Conv(na * cfg.get('NUM_DIR_BINS', 2), (1, 1),
                                name='conv_dir_cls')(x)
            batch['anchor_dir_preds'] = to_anchor_major(
                dir_preds, cfg.get('NUM_DIR_BINS', 2))
            batch['anchor_dir_preds_map'] = dir_preds
        return batch

    # ---- target assignment (pure) ----

    def assign_targets(self, batch: dict) -> dict:
        cfg = as_cfg(self.model_cfg)
        anchors, slices = self._anchors()
        A = anchors.shape[0]
        tcfg = cfg.TARGET_ASSIGNER_CONFIG
        gt_boxes = batch['gt_boxes']          # (B, M, 8)
        gt_mask = batch['gt_mask']

        thr = [(c['matched_threshold'], c['unmatched_threshold'])
               for c in cfg.ANCHOR_GENERATOR_CONFIG]

        if tcfg.get('NAME') == 'ATSSTargetAssigner':
            topk = int(tcfg.get('TOPK', 9))

            def single_atss(gts, gmask):
                labels, gt_of_anchor, pos = atss_assign_single(
                    anchors, gts, gmask, topk, self.num_class,
                    match_height=tcfg.get('MATCH_HEIGHT', False))
                enc = self._coder().encode(gt_of_anchor[:, :7], anchors)
                box_targets = jnp.where(pos[:, None], enc, 0.0)
                dir_offset = cfg.get('DIR_OFFSET', 0.78539)
                num_bins = cfg.get('NUM_DIR_BINS', 2)
                offset_rot = limit_period(gt_of_anchor[:, 6] - dir_offset,
                                          0, 2 * jnp.pi)
                dir_targets = jnp.clip(
                    (offset_rot / (2 * jnp.pi / num_bins)).astype(jnp.int32),
                    0, num_bins - 1)
                return labels, box_targets, dir_targets

            labels, box_targets, dir_targets = jax.vmap(single_atss)(
                gt_boxes, gt_mask)
            return {'anchor_cls_labels': labels,
                    'anchor_box_targets': box_targets,
                    'anchor_dir_targets': dir_targets}

        def single(gts, gmask):
            iou = nearest_bev_iou(anchors, gts[:, :7])           # (A, M)
            gt_cls = gts[:, -1].astype(jnp.int32)                # 1-indexed
            # per-anchor thresholds by its class block; gt of other classes ignored
            matched_t = jnp.zeros((A,), jnp.float32)
            unmatched_t = jnp.zeros((A,), jnp.float32)
            anchor_cls = jnp.zeros((A,), jnp.int32)
            for ci, (s0, s1) in enumerate(slices):
                matched_t = matched_t.at[s0:s1].set(thr[ci][0])
                unmatched_t = unmatched_t.at[s0:s1].set(thr[ci][1])
                anchor_cls = anchor_cls.at[s0:s1].set(ci + 1)
            same_class = anchor_cls[:, None] == gt_cls[None, :]
            iou = jnp.where(same_class & gmask[None, :], iou, -1.0)

            best_gt_iou = jnp.max(iou, axis=1)
            best_gt = jnp.argmax(iou, axis=1)
            # force-match: EVERY anchor tying a gt's max overlap is positive
            # (`axis_aligned_target_assigner.py:155-158` compares the full
            # column against gt_to_anchor_max, not just the argmax — ties are
            # common when small anchors sit fully inside a large gt). The
            # iou > 0 guard reproduces the empty-gt -1 sentinel (:152-153)
            # and excludes masked pairs (already -1 here).
            gt_max = jnp.max(iou, axis=0)                        # (M,)
            force = jnp.any((iou == gt_max[None, :]) & (iou > 0), axis=1)
            pos = (best_gt_iou >= matched_t) | force
            neg = (best_gt_iou < unmatched_t) & ~pos
            labels = jnp.where(pos, gt_cls[best_gt], jnp.where(neg, 0, -1))

            tgt_gt = gts[best_gt][:, :7]
            enc = self._coder().encode(tgt_gt, anchors)
            box_targets = jnp.where(pos[:, None], enc, 0.0)
            # direction targets
            dir_offset = cfg.get('DIR_OFFSET', 0.78539)
            num_bins = cfg.get('NUM_DIR_BINS', 2)
            rot_gt = gts[best_gt][:, 6]
            offset_rot = limit_period(rot_gt - dir_offset, 0, 2 * jnp.pi)
            dir_targets = jnp.clip(
                (offset_rot / (2 * jnp.pi / num_bins)).astype(jnp.int32),
                0, num_bins - 1)
            return labels, box_targets, dir_targets

        labels, box_targets, dir_targets = jax.vmap(single)(gt_boxes, gt_mask)
        return {'anchor_cls_labels': labels, 'anchor_box_targets': box_targets,
                'anchor_dir_targets': dir_targets}

    # ---- losses (pure) ----

    def get_loss(self, batch: dict, targets: dict):
        cfg = as_cfg(self.model_cfg)
        lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
        labels = targets['anchor_cls_labels']                    # (B, A)
        cls_preds = batch['anchor_cls_preds']                    # (B, A, nc)
        pos = labels > 0
        neg = labels == 0
        cls_w = (pos + neg).astype(jnp.float32)
        pos_norm = jnp.sum(pos, axis=1, keepdims=True).astype(jnp.float32)
        cls_w = cls_w / jnp.clip(pos_norm, min=1.0)
        one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), self.num_class + 1)[..., 1:]
        cls_loss = jnp.sum(losses.sigmoid_focal_loss(cls_preds, one_hot, cls_w)) \
            / labels.shape[0] * lw['cls_weight']

        box_preds = batch['anchor_box_preds']                    # (B, A, 7)
        box_tgt = targets['anchor_box_targets']
        # sin-difference on the heading channel (`add_sin_difference:137-144`)
        sin_diff = jnp.sin(box_preds[..., 6:7]) * jnp.cos(box_tgt[..., 6:7])
        cos_diff = jnp.cos(box_preds[..., 6:7]) * jnp.sin(box_tgt[..., 6:7])
        bp = jnp.concatenate([box_preds[..., :6], sin_diff, box_preds[..., 7:]], -1)
        bt = jnp.concatenate([box_tgt[..., :6], cos_diff, box_tgt[..., 7:]], -1)
        reg_w = pos.astype(jnp.float32) / jnp.clip(pos_norm, min=1.0)
        loc_loss = jnp.sum(losses.weighted_smooth_l1(
            bp, bt, reg_w, code_weights=lw.get('code_weights'))) \
            / labels.shape[0] * lw['loc_weight']

        total = cls_loss + loc_loss
        tb = {'anchor_cls_loss': cls_loss, 'anchor_loc_loss': loc_loss}
        if 'anchor_dir_preds' in batch:
            num_bins = cfg.get('NUM_DIR_BINS', 2)
            dir_oh = jax.nn.one_hot(targets['anchor_dir_targets'], num_bins)
            dir_loss = jnp.sum(losses.weighted_cross_entropy(
                batch['anchor_dir_preds'], dir_oh, reg_w)) \
                / labels.shape[0] * lw['dir_weight']
            total = total + dir_loss
            tb['anchor_dir_loss'] = dir_loss
        return total, tb

    # ---- decode (pure) ----

    def generate_predicted_boxes(self, batch: dict):
        """(`anchor_head_template.generate_predicted_boxes:227-272`.)"""
        cfg = as_cfg(self.model_cfg)
        anchors, _ = self._anchors()
        cls_preds = batch['anchor_cls_preds']
        box_preds = batch['anchor_box_preds']
        boxes = self._coder().decode(box_preds, anchors[None])
        if 'anchor_dir_preds' in batch:
            dir_offset = cfg.get('DIR_OFFSET', 0.78539)
            dir_limit = cfg.get('DIR_LIMIT_OFFSET', 0.0)
            num_bins = cfg.get('NUM_DIR_BINS', 2)
            period = 2 * jnp.pi / num_bins
            dir_labels = jnp.argmax(batch['anchor_dir_preds'], axis=-1)
            rot = limit_period(boxes[..., 6] - dir_offset, dir_limit, period)
            boxes = boxes.at[..., 6].set(
                rot + dir_offset + period * dir_labels.astype(boxes.dtype))
        return cls_preds, boxes


class AnchorHeadMulti(AnchorHeadSingle):
    """Grouped multi-head anchors (`pcdet/models/dense_heads/anchor_head_multi
    .py`): a shared conv trunk, then one head per RPN_HEAD_CFGS group
    predicting only its classes' anchors. Outputs are assembled into the
    global anchor-major layout of `AnchorHeadSingle`, with the logits of
    classes foreign to a head pinned to a large negative constant (their
    sigmoid is ~0, matching the reference's structural absence), so the
    assigner/losses/decode are shared unchanged.
    """

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        x = batch['spatial_features_2d']
        code = self._coder().code_size
        n_dir = cfg.get('NUM_DIR_BINS', 2)
        use_dir = cfg.get('USE_DIRECTION_CLASSIFIER', True)

        shared_ch = cfg.get('SHARED_CONV_NUM_FILTER', 64)
        h = nn.Conv(shared_ch, (3, 3), padding=1, use_bias=False,
                    name='shared_conv')(x)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3, name='shared_bn')(h)
        h = nn.relu(h)
        B, H, W, _ = h.shape

        gen_cfgs = list(cfg.ANCHOR_GENERATOR_CONFIG)
        cls_names = [c['class_name'] for c in gen_cfgs]
        n_rot_per_class = [len(c['anchor_sizes']) * len(c['anchor_rotations'])
                           for c in gen_cfgs]
        head_groups = [list(hc['HEAD_CLS_NAME']) for hc in cfg.RPN_HEAD_CFGS]

        per_class_cls = {}
        per_class_box = {}
        per_class_dir = {}
        for gi, group in enumerate(head_groups):
            n_loc = sum(n_rot_per_class[cls_names.index(n)] for n in group)
            gcls = nn.Conv(n_loc * len(group), (1, 1), name=f'head{gi}_cls',
                           bias_init=nn.initializers.constant(
                               -float(np.log((1 - 0.01) / 0.01))))(h)
            gbox = nn.Conv(n_loc * code, (1, 1), name=f'head{gi}_box')(h)
            gdir = nn.Conv(n_loc * n_dir, (1, 1),
                           name=f'head{gi}_dir')(h) if use_dir else None
            off = 0
            for ln, name in enumerate(group):
                nr = n_rot_per_class[cls_names.index(name)]
                sl = slice(off, off + nr)
                per_class_cls[name] = (
                    gcls.reshape(B, H, W, n_loc, len(group))[:, :, :, sl, ln])
                per_class_box[name] = (
                    gbox.reshape(B, H, W, n_loc, code)[:, :, :, sl])
                if use_dir:
                    per_class_dir[name] = (
                        gdir.reshape(B, H, W, n_loc, n_dir)[:, :, :, sl])
                off += nr

        # assemble the global anchor-major tensors in generator-config order
        cls_out, box_out, dir_out = [], [], []
        for ci, name in enumerate(cls_names):
            nr = n_rot_per_class[ci]
            logit = per_class_cls[name]                    # (B, H, W, nr)
            full = jnp.full((B, H, W, nr, self.num_class), -10.0, logit.dtype)
            full = full.at[..., ci].set(logit)
            cls_out.append(full.transpose(0, 3, 1, 2, 4).reshape(B, -1, self.num_class))
            box_out.append(per_class_box[name].transpose(0, 3, 1, 2, 4)
                           .reshape(B, -1, code))
            if use_dir:
                dir_out.append(per_class_dir[name].transpose(0, 3, 1, 2, 4)
                               .reshape(B, -1, n_dir))
        batch['anchor_cls_preds'] = jnp.concatenate(cls_out, axis=1)
        batch['anchor_box_preds'] = jnp.concatenate(box_out, axis=1)
        if use_dir:
            batch['anchor_dir_preds'] = jnp.concatenate(dir_out, axis=1)
        return batch


def atss_assign_single(anchors, gts, gmask, topk, num_class,
                       match_height: bool = False):
    """ATSS target assignment for one sample, fixed shapes
    (`target_assigner/atss_target_assigner.py:75-147`): per gt, the top-k
    center-closest anchors are candidates; the positive IoU threshold adapts
    to mean+std of the candidate IoUs; candidates must also sit inside the
    gt's BEV rectangle; anchors claimed by several gts keep the highest-IoU
    one; every gt force-matches its best anchor (max-combining scatter).
    IoU is the nearest-BEV form (same approximation as the axis-aligned
    assigner here; the reference uses rotated BEV IoU).

    Returns (labels (A,), gt_of_anchor (A, 8), reg_mask (A,)).
    """
    A = anchors.shape[0]
    M = gts.shape[0]
    iou = nearest_bev_iou(anchors[:, :7], gts[:, :7])          # (A, M)
    iou = jnp.where(gmask[None, :], iou, -1.0)

    dist = jnp.linalg.norm(anchors[:, None, :3] - gts[None, :, :3], axis=-1)
    dist = jnp.where(gmask[None, :], dist, jnp.inf)
    _, cand = jax.lax.top_k(-dist.T, topk)                     # (M, K)

    cand_iou = jnp.take_along_axis(iou.T, cand, axis=1)        # (M, K)
    mean = jnp.mean(cand_iou, axis=1, keepdims=True)
    std = jnp.std(cand_iou, axis=1, keepdims=True)
    is_pos = cand_iou >= (mean + std + 1e-6)

    # candidate anchor centers inside the gt BEV rectangle
    cxyz = jnp.take_along_axis(
        jnp.broadcast_to(anchors[None, :, :3], (M, A, 3)),
        cand[..., None], axis=1)                               # (M, K, 3)
    local = cxyz - gts[:, None, :3]
    c, s = jnp.cos(-gts[:, 6]), jnp.sin(-gts[:, 6])
    lx = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    ly = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    in_gt = (jnp.abs(lx) <= gts[:, None, 3] / 2) \
        & (jnp.abs(ly) <= gts[:, None, 4] / 2)
    is_pos = is_pos & in_gt & gmask[:, None]

    # per-anchor best gt among claims (scatter-max of claimed IoUs)
    flat = (cand + jnp.arange(M)[:, None] * A).reshape(-1)
    claimed = jnp.full((M * A,), -jnp.inf)
    claimed = claimed.at[flat].max(
        jnp.where(is_pos, cand_iou, -jnp.inf).reshape(-1))
    claimed = claimed.reshape(M, A).T                          # (A, M)
    best_iou = jnp.max(claimed, axis=1)
    best_gt = jnp.argmax(claimed, axis=1)

    # force-match each gt's best anchor
    gt_best_anchor = jnp.argmax(iou, axis=0)                   # (M,)
    gt_best_iou = jnp.max(iou, axis=0)
    force = jnp.zeros((A,), bool).at[gt_best_anchor].max(gmask)
    forced_gt = jnp.zeros((A,), jnp.int32).at[gt_best_anchor].max(
        jnp.where(gmask, jnp.arange(M, dtype=jnp.int32), 0))
    forced_iou = jnp.zeros((A,)).at[gt_best_anchor].max(
        jnp.where(gmask, gt_best_iou, 0.0))

    pos = (best_iou > -jnp.inf) | force
    gt_idx = jnp.where(force & (best_iou <= -jnp.inf), forced_gt, best_gt)
    gt_of_anchor = gts[gt_idx]
    labels = jnp.where(pos, gt_of_anchor[..., 7].astype(jnp.int32), 0)
    return labels, gt_of_anchor, pos
