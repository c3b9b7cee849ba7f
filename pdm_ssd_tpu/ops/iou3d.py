"""Rotated BEV overlap / IoU and rotated NMS, fixed-shape and jittable.

TPU-native equivalent of the reference CUDA extension `iou3d_nms_cuda`
(`pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu`):

- `boxes_overlap_bev` / `boxes_iou_bev`: exact rotated-rectangle intersection via
  Sutherland–Hodgman polygon clipping with fixed-size vertex buffers
  (kernel analog: `iou3d_nms_kernel.cu:15-235` which clips with cross products).
- `boxes_iou3d`: BEV overlap x height overlap / volume union
  (`iou3d_nms_utils.boxes_iou3d_gpu`, `iou3d_nms_utils.py:48-81`).
- `nms_bev`: score-sorted greedy suppression over a KxK IoU matrix as a
  `lax.scan` (bitmask-kernel analog: `iou3d_nms_kernel.cu:295`), fixed-size
  outputs (indices + validity mask) instead of dynamic keep lists.

All polygon buffers are static: clipping a quad by a convex quad yields <= 8
vertices; we carry a 16-slot buffer with a vertex count in SSA style.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8
_P = 16  # vertex buffer slots (>= max 8 vertices of quad-quad intersection)


def _box_to_bev_corners(box: jax.Array) -> jax.Array:
    """(7,) -> (4, 2) BEV corners, counter-clockwise."""
    cx, cy, dx, dy, rz = box[0], box[1], box[3], box[4], box[6]
    c, s = jnp.cos(rz), jnp.sin(rz)
    hx, hy = dx / 2.0, dy / 2.0
    local = jnp.array([[1., 1.], [-1., 1.], [-1., -1.], [1., -1.]]) * jnp.stack([hx, hy])
    x = local[:, 0] * c - local[:, 1] * s + cx
    y = local[:, 0] * s + local[:, 1] * c + cy
    return jnp.stack([x, y], axis=-1)


def _compact(verts: jax.Array, valid: jax.Array, out_slots: int):
    """Stable-move valid vertices to the buffer prefix; returns (verts, cnt)."""
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
    verts = verts[order][:out_slots]
    cnt = jnp.sum(valid).astype(jnp.int32)
    return verts, cnt


def _clip_halfplane(verts: jax.Array, cnt: jax.Array, a: jax.Array, b: jax.Array):
    """Clip convex polygon (prefix `cnt` of `verts`, (P,2)) by half-plane on the
    left of directed edge a->b. Returns compacted (verts, cnt)."""
    e = b - a
    # signed area cross(e, v - a); inside if >= 0 (CCW polygon, left of edge)
    d = e[0] * (verts[:, 1] - a[1]) - e[1] * (verts[:, 0] - a[0])  # (P,)
    idx = jnp.arange(_P)
    nxt_idx = jnp.where(idx + 1 < cnt, idx + 1, 0)
    d_nxt = d[nxt_idx]
    v_nxt = verts[nxt_idx]
    cur_in = d >= 0.0
    nxt_in = d_nxt >= 0.0
    slot_live = idx < cnt

    denom = d - d_nxt
    t = d / jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
    inter = verts + t[:, None] * (v_nxt - verts)

    out_verts = jnp.zeros((2 * _P, 2), verts.dtype)
    out_valid = jnp.zeros((2 * _P,), bool)
    out_verts = out_verts.at[0::2].set(verts)
    out_valid = out_valid.at[0::2].set(slot_live & cur_in)
    out_verts = out_verts.at[1::2].set(inter)
    out_valid = out_valid.at[1::2].set(slot_live & (cur_in != nxt_in))
    return _compact(out_verts, out_valid, _P)


def _poly_area(verts: jax.Array, cnt: jax.Array) -> jax.Array:
    """Shoelace area of the prefix-cnt polygon; padded slots are replaced by v0 so
    they contribute zero."""
    idx = jnp.arange(_P)
    v = jnp.where((idx < cnt)[:, None], verts, verts[0])
    v_next = jnp.roll(v, -1, axis=0)
    cross = v[:, 0] * v_next[:, 1] - v_next[:, 0] * v[:, 1]
    return jnp.abs(jnp.sum(cross)) / 2.0


def _pair_overlap_bev(box_a: jax.Array, box_b: jax.Array) -> jax.Array:
    """Exact intersection area of two rotated BEV rectangles ((7,) boxes)."""
    ca = _box_to_bev_corners(box_a)
    cb = _box_to_bev_corners(box_b)
    verts = jnp.zeros((_P, 2), box_a.dtype).at[:4].set(ca)
    cnt = jnp.asarray(4, jnp.int32)

    def clip_edge(carry, k):
        verts, cnt = carry
        a = cb[k]
        b = cb[(k + 1) % 4]
        verts, cnt = _clip_halfplane(verts, cnt, a, b)
        return (verts, cnt), None

    (verts, cnt), _ = jax.lax.scan(clip_edge, (verts, cnt), jnp.arange(4))
    return jnp.where(cnt >= 3, _poly_area(verts, cnt), 0.0)


@jax.jit
def boxes_overlap_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """(N, 7) x (M, 7) -> (N, M) rotated BEV intersection areas."""
    return jax.vmap(lambda a: jax.vmap(lambda b: _pair_overlap_bev(a, b))(boxes_b))(boxes_a)


@jax.jit
def boxes_iou_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """(N, 7) x (M, 7) -> (N, M) rotated BEV IoU (`iou_bev`, `iou3d_nms_kernel.cu:279`)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, min=1e-6)


@jax.jit
def boxes_iou3d(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """(N, 7) x (M, 7) -> (N, M) 3D IoU (`iou3d_nms_utils.boxes_iou3d_gpu:48-81`)."""
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)
    a_max = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_min = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_max = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_min = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    overlap_h = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), min=0.0)
    overlap_3d = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, min=1e-6)


def boxes_aligned_iou3d(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Element-aligned 3D IoU: (N, 7), (N, 7) -> (N,)
    (`iou3d_nms_utils.boxes_aligned_iou3d_gpu:83-117`)."""
    pair = jax.vmap(_pair_overlap_bev)(boxes_a, boxes_b)
    a_max = boxes_a[:, 2] + boxes_a[:, 5] / 2
    a_min = boxes_a[:, 2] - boxes_a[:, 5] / 2
    b_max = boxes_b[:, 2] + boxes_b[:, 5] / 2
    b_min = boxes_b[:, 2] - boxes_b[:, 5] / 2
    overlap_h = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), min=0.0)
    overlap_3d = pair * overlap_h
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, min=1e-6)


@functools.partial(jax.jit, static_argnums=(3, 4))
def nms_bev(boxes: jax.Array, scores: jax.Array, thresh: float,
            pre_maxsize: int, post_maxsize: int,
            valid: jax.Array | None = None):
    """Rotated-BEV NMS with fixed-size outputs.

    Equivalent to `iou3d_nms_utils.nms_gpu:120-135` (score sort -> suppress by
    rotated BEV IoU > thresh) but shaped for XLA: greedy suppression as a scan
    over the pre-NMS top-K, returning exactly `post_maxsize` slots.

    Args:
        boxes: (N, 7). scores: (N,). valid: optional (N,) slot validity.
    Returns:
        (idx, keep_mask): idx (post_maxsize,) int32 indices into N (0-padded),
        keep_mask (post_maxsize,) bool marking real detections.
    """
    N = boxes.shape[0]
    s = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    K = min(pre_maxsize, N)
    top_scores, order = jax.lax.top_k(s, K)
    cand_boxes = boxes[order]
    iou = boxes_iou_bev(cand_boxes, cand_boxes)  # (K, K)
    cand_valid = jnp.isfinite(top_scores)

    def step(keep, i):
        # suppressed if any higher-ranked kept box overlaps > thresh
        sup = jnp.any((iou[i] > thresh) & keep & (jnp.arange(K) < i))
        keep_i = cand_valid[i] & ~sup
        return keep.at[i].set(keep_i), keep_i

    keep0 = jnp.zeros((K,), bool)
    _, kept = jax.lax.scan(step, keep0, jnp.arange(K))
    # stable-compact kept candidates (already score-ordered) into post_maxsize slots
    rank = jnp.argsort(jnp.where(kept, 0, 1), stable=True)
    P = min(post_maxsize, K)
    sel = rank[:P]
    out_idx = order[sel].astype(jnp.int32)
    out_mask = kept[sel]
    if P < post_maxsize:
        out_idx = jnp.pad(out_idx, (0, post_maxsize - P))
        out_mask = jnp.pad(out_mask, (0, post_maxsize - P))
    return jnp.where(out_mask, out_idx, 0), out_mask


@functools.partial(jax.jit, static_argnums=(3, 4))
def circle_nms(boxes: jax.Array, scores: jax.Array, radius: float,
               pre_maxsize: int, post_maxsize: int,
               valid: jax.Array | None = None):
    """Center-distance NMS (`centernet_utils.circle_nms:99-134` analog),
    fixed-shape like `nms_bev`. Suppresses any box whose BEV center lies
    within `radius` of a higher-scoring kept box. ~30x cheaper than rotated
    NMS (no polygon clipping) and near-equivalent for center-based heads."""
    N = boxes.shape[0]
    s = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    K = min(pre_maxsize, N)
    top_scores, order = jax.lax.top_k(s, K)
    cb = boxes[order][:, :2]
    d2 = jnp.sum((cb[:, None, :] - cb[None, :, :]) ** 2, axis=-1)  # (K, K)
    cand_valid = jnp.isfinite(top_scores)

    def step(keep, i):
        sup = jnp.any((d2[i] <= radius * radius) & keep & (jnp.arange(K) < i))
        keep_i = cand_valid[i] & ~sup
        return keep.at[i].set(keep_i), keep_i

    keep0 = jnp.zeros((K,), bool)
    _, kept = jax.lax.scan(step, keep0, jnp.arange(K))
    rank = jnp.argsort(jnp.where(kept, 0, 1), stable=True)
    P = min(post_maxsize, K)
    sel = rank[:P]
    out_idx = order[sel].astype(jnp.int32)
    out_mask = kept[sel]
    if P < post_maxsize:
        out_idx = jnp.pad(out_idx, (0, post_maxsize - P))
        out_mask = jnp.pad(out_mask, (0, post_maxsize - P))
    return jnp.where(out_mask, out_idx, 0), out_mask
