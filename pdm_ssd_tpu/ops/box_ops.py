"""3D box geometry ops in pure JAX (fixed-shape, jittable).

TPU-native equivalents of `pcdet/utils/box_utils.py`, `pcdet/utils/common_utils.py`
(rotate_points_along_z:35, limit_period:21) and the roiaware points-in-boxes CUDA
test (`pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:23-37`).

Box convention (same as reference): (x, y, z, dx, dy, dz, heading[, ...]) with
(x, y, z) the box *center* and heading the rotation around +z.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rotate_points_along_z(points: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate points around z. points: (B, N, 3+C), angle: (B,) radians.
    (Reference `common_utils.rotate_points_along_z:35`.)"""
    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    zeros = jnp.zeros_like(cosa)
    ones = jnp.ones_like(cosa)
    rot = jnp.stack([cosa, sina, zeros,
                     -sina, cosa, zeros,
                     zeros, zeros, ones], axis=-1).reshape(-1, 3, 3)
    xyz = jnp.matmul(points[..., :3], rot)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Wrap angle into [-offset*period, (1-offset)*period). (`common_utils.py:21`.)"""
    return val - jnp.floor(val / period + offset) * period


def boxes_to_corners_3d(boxes3d: jax.Array) -> jax.Array:
    """(N, 7) -> (N, 8, 3) corners, reference corner ordering
    (`box_utils.boxes_to_corners_3d:28`):
        7 -------- 4
       /|         /|
      6 -------- 5 .
      | |        | |
      . 3 -------- 0
      |/         |/
      2 -------- 1
    """
    template = jnp.array([
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ], dtype=boxes3d.dtype) / 2.0
    corners = boxes3d[:, None, 3:6] * template[None, :, :]  # (N, 8, 3)
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def enlarge_box3d(boxes3d: jax.Array, extra_width=(0., 0., 0.)) -> jax.Array:
    """Grow dx/dy/dz by extra_width — each SIDE grows by extra/2
    (`box_utils.enlarge_box3d:187-200`: `large[:, 3:6] += extra_width`,
    added ONCE, not per side); heading/center unchanged."""
    extra = jnp.asarray(extra_width, dtype=boxes3d.dtype)
    return boxes3d.at[..., 3:6].add(extra)


def points_in_boxes(points: jax.Array, boxes: jax.Array,
                    box_mask: jax.Array | None = None) -> jax.Array:
    """Vectorized point-in-rotated-box test.

    Args:
        points: (N, 3).
        boxes: (M, 7) center-z boxes.
        box_mask: optional (M,) validity (padded boxes excluded).
    Returns:
        (N,) int32 index of the first (lowest-index) containing box, -1 if none.
        Matches reference `points_in_boxes_gpu` semantics
        (`roiaware_pool3d_kernel.cu:313`, first match wins).
    """
    MARGIN = 1e-5
    shift = points[:, None, :] - boxes[None, :, :3]  # (N, M, 3)
    cosa = jnp.cos(-boxes[:, 6])
    sina = jnp.sin(-boxes[:, 6])
    local_x = shift[..., 0] * cosa[None, :] - shift[..., 1] * sina[None, :]
    local_y = shift[..., 0] * sina[None, :] + shift[..., 1] * cosa[None, :]
    in_box = (
        (jnp.abs(shift[..., 2]) <= boxes[None, :, 5] / 2.0)
        & (jnp.abs(local_x) < boxes[None, :, 3] / 2.0 + MARGIN)
        & (jnp.abs(local_y) < boxes[None, :, 4] / 2.0 + MARGIN)
    )
    if box_mask is not None:
        in_box = in_box & box_mask[None, :]
    M = boxes.shape[0]
    first = jnp.min(jnp.where(in_box, jnp.arange(M, dtype=jnp.int32)[None, :], M), axis=1)
    return jnp.where(first < M, first, -1).astype(jnp.int32)


def points_in_boxes_batch(points: jax.Array, boxes: jax.Array,
                          box_mask: jax.Array | None = None) -> jax.Array:
    """Batched variant: points (B, N, 3), boxes (B, M, 7) -> (B, N) int32."""
    return jax.vmap(points_in_boxes)(points, boxes, box_mask)


def mask_points_by_range(points: np.ndarray, limit_range) -> np.ndarray:
    """Host-side (numpy) point range mask (`common_utils.mask_points_by_range`).
    Only x/y are tested, like the reference."""
    return ((points[:, 0] >= limit_range[0]) & (points[:, 0] <= limit_range[3])
            & (points[:, 1] >= limit_range[1]) & (points[:, 1] <= limit_range[4]))


def boxes_to_corners_bev(boxes: jax.Array) -> jax.Array:
    """(N, 7+) -> (N, 4, 2) BEV corners (counter-clockwise for heading=0):
    order (+x+y, +x-y, -x-y, -x+y) rotated by heading."""
    template = jnp.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], dtype=boxes.dtype) / 2.0
    corners = boxes[:, None, 3:5] * template[None, :, :]
    cosa, sina = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    x = corners[..., 0] * cosa[:, None] - corners[..., 1] * sina[:, None]
    y = corners[..., 0] * sina[:, None] + corners[..., 1] * cosa[:, None]
    return jnp.stack([x + boxes[:, None, 0], y + boxes[:, None, 1]], axis=-1)


def mask_boxes_outside_range_numpy(boxes: np.ndarray, limit_range, min_num_corners: int = 1,
                                   use_center_to_filter: bool = True) -> np.ndarray:
    """Host-side gt-box range filter (`box_utils.mask_boxes_outside_range_numpy:93`)."""
    if boxes.shape[1] > 7:
        boxes = boxes[:, :7]
    if use_center_to_filter:
        center = boxes[:, 0:3]
        return ((center >= np.asarray(limit_range[0:3])) &
                (center <= np.asarray(limit_range[3:6]))).all(axis=-1)
    corners = np.asarray(boxes_to_corners_3d(jnp.asarray(boxes)))  # (N, 8, 3)
    inside = ((corners >= np.asarray(limit_range[0:3])) &
              (corners <= np.asarray(limit_range[3:6]))).all(axis=2)
    return inside.sum(axis=1) >= min_num_corners
