"""CenterNet-style heatmap target assignment and decoding, fixed-shape JAX.

TPU-native rework of `pcdet/models/model_utils/centernet_utils.py`:

- `gaussian_radius` (:9-35) — identical closed form.
- `draw_gaussians`: replaces the per-object Python loop + numpy window drawing
  (`draw_gaussian_to_heatmap:47-69`) with one vectorized scatter-max of
  fixed (2*RMAX+1)^2 windows for all (padded) objects at once — runs inside jit
  during the train step instead of on host.
- `assign_center_targets`: the single-head target assignment
  (`center_head.py:106-162`) over padded gt boxes, fully vectorized.
- `topk_heatmap` / `decode_bbox_from_heatmap` (:155-241) with fixed K outputs +
  validity mask instead of dynamic boolean indexing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

RMAX = 24  # max gaussian radius in cells; windows are (2*RMAX+1)^2


def gaussian_radius(height: jax.Array, width: jax.Array, min_overlap: float = 0.5) -> jax.Array:
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, min=0))
    r1 = (b1 + sq1) / 2
    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, min=0))
    r2 = (b2 + sq2) / 2
    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, min=0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians(heatmap: jax.Array, centers_int: jax.Array, radius: jax.Array,
                   class_ids: jax.Array, valid: jax.Array) -> jax.Array:
    """Scatter-max per-object Gaussians onto a class heatmap.

    Args:
        heatmap: (C, H, W) float32.
        centers_int: (M, 2) int32 (x, y) cell coordinates.
        radius: (M,) int32 radii (clamped to RMAX).
        class_ids: (M,) int32 in [0, C).
        valid: (M,) bool.
    Returns:
        updated heatmap.

    Equivalent to looping `draw_gaussian_to_heatmap` (reference :47-69) with
    sigma = diameter/6 and max-composition; the reference zeroes gaussian values
    < eps*max which we skip (they are ~0 and max-compose harmlessly).
    """
    C, H, W = heatmap.shape
    M = centers_int.shape[0]
    r = jnp.clip(radius, 1, RMAX)
    win = 2 * RMAX + 1
    dy = jnp.arange(-RMAX, RMAX + 1)
    dx = jnp.arange(-RMAX, RMAX + 1)
    off_y = jnp.broadcast_to(dy[:, None], (win, win))
    off_x = jnp.broadcast_to(dx[None, :], (win, win))
    # gaussian value per object per window cell; sigma = (2r+1)/6
    sigma = (2 * r.astype(jnp.float32) + 1) / 6.0
    g = jnp.exp(-(off_x[None] ** 2 + off_y[None] ** 2)
                / (2 * sigma[:, None, None] ** 2))  # (M, win, win)
    inside_r = (jnp.abs(off_x[None]) <= r[:, None, None]) & (jnp.abs(off_y[None]) <= r[:, None, None])
    ys = centers_int[:, 1, None, None] + off_y[None]
    xs = centers_int[:, 0, None, None] + off_x[None]
    in_map = (ys >= 0) & (ys < H) & (xs >= 0) & (xs < W)
    ok = inside_r & in_map & valid[:, None, None]
    flat_idx = jnp.where(ok, class_ids[:, None, None] * (H * W) + ys * W + xs, C * H * W)
    flat = jnp.concatenate([heatmap.reshape(-1), jnp.zeros((1,), heatmap.dtype)])
    flat = flat.at[flat_idx.reshape(-1)].max(jnp.where(ok, g, 0.0).reshape(-1))
    return flat[:-1].reshape(C, H, W)


def draw_gaussians_dense(heatmap: jax.Array, centers_int: jax.Array,
                         radius: jax.Array, class_ids: jax.Array,
                         valid: jax.Array) -> jax.Array:
    """Same result as `draw_gaussians` but computed as a dense per-pixel max
    instead of a scatter-max: TPU scatters run at ~0.2 Gelem/s while the dense
    broadcast is pure VPU work (~7x faster at KITTI shapes). Values are
    identical: exp(-(dx^2+dy^2)/(2 sigma^2)) at integer offsets within the
    radius box, max-composed per class."""
    C, H, W = heatmap.shape
    r = jnp.clip(radius, 1, RMAX).astype(jnp.float32)
    sigma = (2 * r + 1) / 6.0                                  # (M,)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    dx = xs[None] - centers_int[:, 0][:, None, None]           # (M, H, W)
    dy = ys[None] - centers_int[:, 1][:, None, None]
    g = jnp.exp(-(dx * dx + dy * dy)
                / (2.0 * sigma[:, None, None] ** 2))
    inside = ((jnp.abs(dx) <= r[:, None, None].astype(jnp.int32))
              & (jnp.abs(dy) <= r[:, None, None].astype(jnp.int32))
              & valid[:, None, None])
    g = jnp.where(inside, g, 0.0)
    outs = []
    for c in range(C):
        mc = (class_ids == c)[:, None, None]
        outs.append(jnp.max(jnp.where(mc, g, 0.0), axis=0))
    return jnp.maximum(heatmap, jnp.stack(outs, axis=0))


def assign_center_targets(gt_boxes: jax.Array, gt_valid: jax.Array, num_classes: int,
                          feature_map_size, feature_map_stride, voxel_size,
                          point_cloud_range, num_max_objs: int = 500,
                          gaussian_overlap: float = 0.1, min_radius: int = 2):
    """Single-sample CenterHead target assignment (`center_head.py:106-162`).

    Args:
        gt_boxes: (M, 8) [x y z dx dy dz heading cls(1-indexed)]; padded rows
            must have gt_valid False.
        gt_valid: (M,) bool.
        feature_map_size: (W, H) i.e. (size_x, size_y).
    Returns:
        heatmap (C, H, W), ret_boxes (num_max_objs, code), inds (num_max_objs,),
        mask (num_max_objs,) — identical meaning to the reference.
    """
    W, H = int(feature_map_size[0]), int(feature_map_size[1])
    M = gt_boxes.shape[0]
    assert M <= num_max_objs

    x, y, z = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2]
    coord_x = (x - point_cloud_range[0]) / voxel_size[0] / feature_map_stride
    coord_y = (y - point_cloud_range[1]) / voxel_size[1] / feature_map_stride
    coord_x = jnp.clip(coord_x, 0, W - 0.5)
    coord_y = jnp.clip(coord_y, 0, H - 0.5)
    center = jnp.stack([coord_x, coord_y], axis=-1)
    center_int = center.astype(jnp.int32)

    dx = gt_boxes[:, 3] / voxel_size[0] / feature_map_stride
    dy = gt_boxes[:, 4] / voxel_size[1] / feature_map_stride
    radius = gaussian_radius(dx, dy, min_overlap=gaussian_overlap).astype(jnp.int32)
    radius = jnp.clip(radius, min=min_radius)

    ok = gt_valid & (dx > 0) & (dy > 0) \
        & (center_int[:, 0] >= 0) & (center_int[:, 0] <= W) \
        & (center_int[:, 1] >= 0) & (center_int[:, 1] <= H)
    cls_ids = jnp.clip(gt_boxes[:, -1].astype(jnp.int32) - 1, 0, num_classes - 1)

    heatmap = jnp.zeros((num_classes, H, W), jnp.float32)
    heatmap = draw_gaussians_dense(heatmap, center_int, radius, cls_ids, ok)

    code = gt_boxes.shape[-1]  # 8 -> ret code 8 (dx,dy offsets, z, log dims, cos, sin)
    ret_boxes = jnp.zeros((num_max_objs, code), jnp.float32)
    inds = jnp.zeros((num_max_objs,), jnp.int32)
    mask = jnp.zeros((num_max_objs,), jnp.int32)

    vals = jnp.concatenate([
        center - center_int.astype(jnp.float32),
        z[:, None],
        jnp.log(jnp.clip(gt_boxes[:, 3:6], min=1e-5)),
        jnp.cos(gt_boxes[:, 6])[:, None],
        jnp.sin(gt_boxes[:, 6])[:, None],
        gt_boxes[:, 7:-1],
    ], axis=-1)
    sl = jnp.arange(M)
    ret_boxes = ret_boxes.at[sl].set(jnp.where(ok[:, None], vals, 0.0))
    inds = inds.at[sl].set(jnp.where(ok, center_int[:, 1] * W + center_int[:, 0], 0))
    mask = mask.at[sl].set(ok.astype(jnp.int32))
    # raw (un-encoded) gt boxes per slot — the reference's `target_boxes_src`
    # (`center_head.py:216-221`), needed by the IoU rectification losses
    src = jnp.zeros((num_max_objs, code), jnp.float32)
    src = src.at[sl].set(jnp.where(ok[:, None], gt_boxes, 0.0))
    return heatmap, ret_boxes, inds, mask, src


@functools.partial(jax.jit, static_argnums=(1,))
def topk_heatmap(scores: jax.Array, K: int):
    """(B, C, H, W) -> per-batch top-K over all classes and positions
    (`centernet_utils._topk:155-171`).

    Two-stage selection: blockwise max-reduce (vector op) then a small top_k —
    a direct top_k over C*H*W ~ 100k costs ~25ms on this TPU, the two-stage
    form ~3ms. Exactness: a block of size S can hide at most one candidate per
    block; with S chosen so that #blocks >= 8*K the result matches the full
    top-K except in the (vanishing) case of >1 final peaks sharing a block —
    and the CenterNet local-peak structure makes adjacent-cell ties rare."""
    from .selection import two_stage_topk
    B, C, H, W = scores.shape
    flat = scores.reshape(B, C * H * W)
    topk_score, topk_ind = two_stage_topk(flat, K)
    topk_classes = (topk_ind // (H * W)).astype(jnp.int32)
    topk_inds = topk_ind % (H * W)
    topk_ys = (topk_inds // W).astype(jnp.float32)
    topk_xs = (topk_inds % W).astype(jnp.float32)
    return topk_score, topk_inds.astype(jnp.int32), topk_classes, topk_ys, topk_xs


def decode_bbox_from_heatmap(heatmap, rot_cos, rot_sin, center, center_z, dim,
                             point_cloud_range, voxel_size, feature_map_stride,
                             K=100, score_thresh=None, post_center_limit_range=None,
                             vel=None, iou=None):
    """Fixed-K heatmap decode (`centernet_utils.decode_bbox_from_heatmap:173-241`).

    All channel tensors are (B, C_head, H, W). Returns dict of fixed-shape arrays:
    boxes (B, K, 7+), scores (B, K), labels (B, K), mask (B, K) — masking replaces
    the reference's dynamic boolean selection.
    """
    B = heatmap.shape[0]
    scores, inds, class_ids, ys, xs = topk_heatmap(heatmap, K)

    def gather(feat):  # (B, C, H, W) -> (B, K, C)
        Bc, C, H, W = feat.shape
        flat = feat.reshape(Bc, C, H * W).transpose(0, 2, 1)
        return jnp.take_along_axis(flat, inds[..., None], axis=1)

    center = gather(center)
    rot_sin = gather(rot_sin)[..., 0]
    rot_cos = gather(rot_cos)[..., 0]
    center_z = gather(center_z)[..., 0]
    dim = gather(dim)
    angle = jnp.arctan2(rot_sin, rot_cos)
    xs = xs + center[..., 0]
    ys = ys + center[..., 1]
    xs = xs * feature_map_stride * voxel_size[0] + point_cloud_range[0]
    ys = ys * feature_map_stride * voxel_size[1] + point_cloud_range[1]

    parts = [xs[..., None], ys[..., None], center_z[..., None], dim, angle[..., None]]
    if vel is not None:
        parts.append(gather(vel))
    boxes = jnp.concatenate(parts, axis=-1)

    mask = jnp.ones((B, K), bool)
    if post_center_limit_range is not None:
        lim = jnp.asarray(post_center_limit_range)
        mask &= jnp.all(boxes[..., :3] >= lim[:3], axis=-1)
        mask &= jnp.all(boxes[..., :3] <= lim[3:], axis=-1)
    if score_thresh is not None:
        mask &= scores > score_thresh

    out = {'pred_boxes': boxes, 'pred_scores': scores,
           'pred_labels': class_ids, 'pred_mask': mask}
    if iou is not None:
        out['pred_iou'] = gather(iou)[..., 0]
    return out


def decode_boxes_at_inds(preds: dict, inds: jax.Array, point_cloud_range,
                         voxel_size, feature_map_stride, fmap_wh) -> jax.Array:
    """Decode box7 at flat heatmap indices — the per-slot analog of the
    reference `centernet_utils.decode_bbox_from_pred_dicts` used by the
    CenterHead IoU losses (`center_head.py:260-266`).

    preds: dict of NHWC tensors ('center', 'center_z', 'dim', 'rot').
    inds: (B, K) flat y*W+x indices. Returns (B, K, 7).
    """
    W, H = fmap_wh

    def gather(t):  # (B, H, W, C) -> (B, K, C)
        B, Hh, Ww, C = t.shape
        flat = t.reshape(B, Hh * Ww, C)
        return jnp.take_along_axis(flat, inds[..., None], axis=1)

    center = gather(preds['center'])
    center_z = gather(preds['center_z'])[..., 0]
    dim = jnp.exp(jnp.clip(gather(preds['dim']), -5.0, 5.0))
    rot = gather(preds['rot'])
    angle = jnp.arctan2(rot[..., 1], rot[..., 0])
    xs = (inds % W).astype(jnp.float32) + center[..., 0]
    ys = (inds // W).astype(jnp.float32) + center[..., 1]
    xs = xs * feature_map_stride * voxel_size[0] + point_cloud_range[0]
    ys = ys * feature_map_stride * voxel_size[1] + point_cloud_range[1]
    return jnp.concatenate([xs[..., None], ys[..., None], center_z[..., None],
                            dim, angle[..., None]], axis=-1)
