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


def _boxes_to_corners_batched(boxes: jax.Array) -> jax.Array:
    """(R, 7) -> (R, 4, 2) BEV corners, counter-clockwise."""
    cx, cy, dx, dy, rz = (boxes[:, 0], boxes[:, 1], boxes[:, 3], boxes[:, 4],
                          boxes[:, 6])
    c, s = jnp.cos(rz), jnp.sin(rz)
    local = jnp.array([[1., 1.], [-1., 1.], [-1., -1.], [1., -1.]])  # (4, 2)
    lx = local[None, :, 0] * (dx / 2)[:, None]
    ly = local[None, :, 1] * (dy / 2)[:, None]
    x = lx * c[:, None] - ly * s[:, None] + cx[:, None]
    y = lx * s[:, None] + ly * c[:, None] + cy[:, None]
    return jnp.stack([x, y], axis=-1)


def _compact_batched(verts: jax.Array, valid: jax.Array, out_slots: int):
    """Batched stable compaction without sorts: target rank via a triangular
    matmul (exclusive prefix count of valid), extraction via a fused one-hot
    select-sum — the same MXU trick as `ops/sa_fused`. verts (R, S, 2),
    valid (R, S) -> (verts (R, out_slots, 2), cnt (R,))."""
    R, S, _ = verts.shape
    w = valid.astype(jnp.bfloat16)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    stri = (r_i > c_i).astype(jnp.bfloat16).T          # (S, S) strictly-lower^T
    rank = jax.lax.dot_general(w, stri, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (R, S)
    # one nonzero per output slot: exact f32 select-sum (not a true matmul)
    j = jnp.arange(out_slots, dtype=jnp.float32)
    onehot = (rank[:, None, :] == j[None, :, None]) & valid[:, None, :]
    out = jnp.sum(jnp.where(onehot[..., None], verts[:, None, :, :], 0.0), axis=2)
    cnt = jnp.sum(valid, axis=1).astype(jnp.int32)
    return out, cnt


def _clip_halfplane_batched(verts, cnt, a, b, out_slots):
    """Batched Sutherland-Hodgman clip by the half-plane left of edge a->b.
    verts (R, P, 2) contiguous-prefix polygons with counts cnt (R,);
    a, b: (R, 2). Returns compacted (verts (R, out_slots, 2), cnt).

    `out_slots` grows 5..8 across the four clips (convex-polygon ∩
    half-plane adds at most one vertex) instead of a fixed 16-slot buffer,
    and the interleave is a stack+reshape rather than two strided scatters
    — together ~2x less NMS-matrix traffic (round-3 PointPillar trace)."""
    R, P, _ = verts.shape
    e = b - a                                             # (R, 2)
    d = (e[:, None, 0] * (verts[..., 1] - a[:, None, 1])
         - e[:, None, 1] * (verts[..., 0] - a[:, None, 0]))  # (R, P)
    idx = jnp.arange(P)[None, :]
    live = idx < cnt[:, None]
    # contiguous prefix -> the cyclic successor is roll(-1), wrapping at cnt-1
    wrap = (idx + 1) == cnt[:, None]
    d_nxt = jnp.where(wrap, d[:, :1], jnp.roll(d, -1, axis=1))
    v_nxt = jnp.where(wrap[..., None], verts[:, :1], jnp.roll(verts, -1, axis=1))
    cur_in = d >= 0.0
    nxt_in = d_nxt >= 0.0

    denom = d - d_nxt
    t = d / jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
    inter = verts + t[..., None] * (v_nxt - verts)

    out_verts = jnp.stack([verts, inter], axis=2).reshape(R, 2 * P, 2)
    out_valid = jnp.stack([live & cur_in, live & (cur_in != nxt_in)],
                          axis=2).reshape(R, 2 * P)
    return _compact_batched(out_verts, out_valid, out_slots)


def _overlap_bev_batched(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Exact rotated-rect intersection areas for R pairs: (R,7),(R,7)->(R,).
    Fully vectorized (no per-pair sorts or scans — those cost seconds at NMS
    matrix scale on TPU; see BENCH_NOTES round 2)."""
    R = boxes_a.shape[0]
    ca = _boxes_to_corners_batched(boxes_a)               # (R, 4, 2)
    cb = _boxes_to_corners_batched(boxes_b)
    verts = ca
    cnt = jnp.full((R,), 4, jnp.int32)
    for k in range(4):                                    # unrolled clip edges
        verts, cnt = _clip_halfplane_batched(verts, cnt, cb[:, k],
                                             cb[:, (k + 1) % 4],
                                             out_slots=5 + k)
    # shoelace over the contiguous prefix (dead slots pinned to v0)
    idx = jnp.arange(verts.shape[1])[None, :]
    v = jnp.where((idx < cnt[:, None])[..., None], verts, verts[:, :1])
    v_next = jnp.roll(v, -1, axis=1)
    cross = v[..., 0] * v_next[..., 1] - v_next[..., 0] * v[..., 1]
    area = jnp.abs(jnp.sum(cross, axis=1)) / 2.0
    return jnp.where(cnt >= 3, area, 0.0)


@jax.jit
def boxes_overlap_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """(N, 7) x (M, 7) -> (N, M) rotated BEV intersection areas."""
    N, M = boxes_a.shape[0], boxes_b.shape[0]
    aa = jnp.repeat(boxes_a, M, axis=0)
    bb = jnp.tile(boxes_b, (N, 1))
    return _overlap_bev_batched(aa, bb).reshape(N, M)


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


def _greedy_suppress(overlap: jax.Array, cand_valid: jax.Array) -> jax.Array:
    """Greedy NMS keep-vector by Jacobi fixpoint iteration.

    The greedy recursion keep[i] = valid[i] & !any_{j<i}(keep[j] & overlap[i,j])
    has a unique solution (induction on rank); iterating it from all-true
    converges in suppression-chain-depth steps, each a vectorized matvec —
    replacing the K-step sequential scan whose per-iteration overhead costs
    ~0.17 ms on this backend (K=512 scan: ~87 ms; this: ~2 ms typical).
    overlap: (K, K) bool, rows=candidate, cols=other; rank order = index order.
    """
    K = overlap.shape[0]
    idx = jnp.arange(K)
    prev = overlap & (idx[None, :] < idx[:, None])        # only higher-ranked

    def cond(state):
        keep, prev_keep, it = state
        return jnp.any(keep != prev_keep) & (it < K)

    def body(state):
        keep, _, it = state
        sup = jnp.any(prev & keep[None, :], axis=1)
        return cand_valid & ~sup, keep, it + 1

    keep0 = cand_valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros((K,), bool), jnp.int32(0)))
    return keep


def _suppression_matrix(cand_boxes: jax.Array, thresh: float,
                        blk: int = 512) -> jax.Array:
    """(K, 7) -> (K, K) bool: rotated-BEV IoU > thresh, row-blocked.

    The polygon-clipping overlap keeps ~450 B of temps per box pair; the
    full KxK matrix at the reference's TRAIN NMS_PRE 4096 needs ~7 GB of
    HBM and OOMs a 16 GB chip. `lax.map` over row tiles serializes the
    temp to one (blk, K) tile (~0.9 GB at 4096) while the bool output
    stays tiny. Values are identical to the unblocked computation."""
    K = cand_boxes.shape[0]
    if K <= blk:
        return boxes_iou_bev(cand_boxes, cand_boxes) > thresh
    nb = -(-K // blk)
    padded = jnp.pad(cand_boxes, ((0, nb * blk - K), (0, 0)))
    rows = jax.lax.map(
        lambda b: boxes_iou_bev(b, cand_boxes) > thresh,
        padded.reshape(nb, blk, padded.shape[-1]))
    return rows.reshape(nb * blk, K)[:K]


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
    suppress = _suppression_matrix(cand_boxes, thresh)  # (K, K) bool
    cand_valid = jnp.isfinite(top_scores)
    kept = _greedy_suppress(suppress, cand_valid)
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
    kept = _greedy_suppress((d2 <= radius * radius), cand_valid)
    rank = jnp.argsort(jnp.where(kept, 0, 1), stable=True)
    P = min(post_maxsize, K)
    sel = rank[:P]
    out_idx = order[sel].astype(jnp.int32)
    out_mask = kept[sel]
    if P < post_maxsize:
        out_idx = jnp.pad(out_idx, (0, post_maxsize - P))
        out_mask = jnp.pad(out_mask, (0, post_maxsize - P))
    return jnp.where(out_mask, out_idx, 0), out_mask


@jax.jit
def bbox3d_overlaps_diou(pred_boxes: jax.Array, gt_boxes: jax.Array) -> jax.Array:
    """Paired axis-aligned DIoU (`pcdet/utils/box_utils.py:396-439`, the
    PillarNet form: rotation ignored, BEV AABB from dims + z extent, minus the
    normalized center distance). boxes: (N, 7) -> (N,) in [-1, 1]."""
    def corners(b):
        half = b[:, 3:5] * 0.5
        return b[:, 0:2] - half, b[:, 0:2] + half

    pmin, pmax = corners(pred_boxes)
    gmin, gmax = corners(gt_boxes)
    inter_wh = jnp.clip(jnp.minimum(pmax, gmax) - jnp.maximum(pmin, gmin), 0.0)
    outer_wh = jnp.clip(jnp.maximum(pmax, gmax) - jnp.minimum(pmin, gmin), 0.0)

    vol_p = pred_boxes[:, 3] * pred_boxes[:, 4] * pred_boxes[:, 5]
    vol_g = gt_boxes[:, 3] * gt_boxes[:, 4] * gt_boxes[:, 5]
    inter_h = jnp.clip(
        jnp.minimum(pred_boxes[:, 2] + 0.5 * pred_boxes[:, 5],
                    gt_boxes[:, 2] + 0.5 * gt_boxes[:, 5])
        - jnp.maximum(pred_boxes[:, 2] - 0.5 * pred_boxes[:, 5],
                      gt_boxes[:, 2] - 0.5 * gt_boxes[:, 5]), 0.0)
    outer_h = jnp.clip(
        jnp.maximum(pred_boxes[:, 2] + 0.5 * pred_boxes[:, 5],
                    gt_boxes[:, 2] + 0.5 * gt_boxes[:, 5])
        - jnp.minimum(pred_boxes[:, 2] - 0.5 * pred_boxes[:, 5],
                      gt_boxes[:, 2] - 0.5 * gt_boxes[:, 5]), 0.0)

    vol_inter = inter_wh[:, 0] * inter_wh[:, 1] * inter_h
    vol_union = vol_p + vol_g - vol_inter
    inter_diag = jnp.sum((gt_boxes[:, 0:3] - pred_boxes[:, 0:3]) ** 2, axis=-1)
    outer_diag = outer_wh[:, 0] ** 2 + outer_wh[:, 1] ** 2 + outer_h ** 2
    dious = vol_inter / jnp.clip(vol_union, 1e-6) \
        - inter_diag / jnp.clip(outer_diag, 1e-6)
    return jnp.clip(dious, -1.0, 1.0)
