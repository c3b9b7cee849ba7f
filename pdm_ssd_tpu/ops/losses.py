"""Loss functions, pure JAX, matching reference numerics (`pcdet/utils/loss_utils.py`).

- `sigmoid_focal_loss`: numerically-stable BCE-with-logits focal variant
  (`loss_utils.py:10-74`).
- `weighted_smooth_l1`: code-weighted smooth-L1 (`loss_utils.py:76-135`).
- `centernet_focal_loss`: CornerNet penalty-reduced focal on sigmoid heatmaps
  (`neg_loss_cornernet`, `loss_utils.py:266-301`).
- `centernet_reg_loss`: flat-index-gathered masked L1 (`_reg_loss:...:397`),
  returning per-code loss like the reference.
- `weighted_cross_entropy`: direction-bin CE (`loss_utils.py:183`).
- `corner_loss_lidar`: min-over-flipped-heading corner smooth-L1 (`loss_utils.py:211`).

All losses are reduction-free or reference-identically reduced; weights mirror
the reference broadcasting rules.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import box_ops


def sigmoid_bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """max(x,0) - x*z + log1p(exp(-|x|)) — the stable BCE the reference uses."""
    return jnp.clip(logits, min=0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(logits: jax.Array, target: jax.Array, weights: jax.Array,
                       gamma: float = 2.0, alpha: float = 0.25) -> jax.Array:
    """Anchor-weighted sigmoid focal loss, no reduction. logits/target: (..., C),
    weights: (...,) broadcast over the class dim (reference shape rule)."""
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = target * alpha + (1 - target) * (1 - alpha)
    pt = target * (1.0 - pred_sigmoid) + (1.0 - target) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    loss = focal_weight * sigmoid_bce_with_logits(logits, target)
    if weights.ndim == loss.ndim - 1:
        weights = weights[..., None]
    return loss * weights


def smooth_l1(diff: jax.Array, beta: float) -> jax.Array:
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)


def weighted_smooth_l1(pred: jax.Array, target: jax.Array, weights: jax.Array | None = None,
                       beta: float = 1.0 / 9.0, code_weights=None) -> jax.Array:
    """(..., #codes) smooth-L1 with per-code weights; NaN targets ignored."""
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, pred.dtype)
    loss = smooth_l1(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_l1(pred: jax.Array, target: jax.Array, weights: jax.Array | None = None,
                code_weights=None) -> jax.Array:
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, pred.dtype)
    loss = jnp.abs(diff)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy(logits: jax.Array, one_hot: jax.Array,
                           weights: jax.Array) -> jax.Array:
    """Softmax CE over the last dim, anchor-weighted (`WeightedCrossEntropyLoss:183`)."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(one_hot * logprobs, axis=-1)
    return loss * weights


def centernet_focal_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """CornerNet focal on already-sigmoided heatmaps. pred/gt: (B, C, H, W) or any
    matching shape. Returns scalar (normalized by num positives)."""
    pos_inds = (gt == 1.0).astype(pred.dtype)
    neg_inds = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1 - gt, 4)
    pos_loss = jnp.log(pred) * jnp.power(1 - pred, 2) * pos_inds
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, 2) * neg_weights * neg_inds
    num_pos = jnp.sum(pos_inds)
    pos_sum = jnp.sum(pos_loss)
    neg_sum = jnp.sum(neg_loss)
    return jnp.where(num_pos == 0, -neg_sum, -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0))


def gather_feat(feat: jax.Array, ind: jax.Array) -> jax.Array:
    """feat: (B, HW, C), ind: (B, K) -> (B, K, C) (`_gather_feat`)."""
    return jnp.take_along_axis(feat, ind[..., None].astype(jnp.int32), axis=1)


def centernet_reg_loss(pred: jax.Array, mask: jax.Array, target: jax.Array) -> jax.Array:
    """Masked L1 over gathered object slots, per-code reduction.

    pred/target: (B, K, D); mask: (B, K). Returns (D,) matching the reference
    (`_reg_loss`: sum over batch+objects, divide by clamp(num_pos, 1))."""
    num = jnp.sum(mask.astype(pred.dtype))
    m = mask[..., None].astype(pred.dtype)
    m = m * (~jnp.isnan(target)).astype(pred.dtype)
    target = jnp.nan_to_num(target)
    loss = jnp.abs(pred * m - target * m)
    loss = jnp.sum(loss, axis=(0, 1))  # (D,)
    return loss / jnp.maximum(num, 1.0)


def corner_loss_lidar(pred_boxes: jax.Array, gt_boxes: jax.Array) -> jax.Array:
    """Corner smooth-L1 with min over flipped heading (`get_corner_loss_lidar:211`).
    pred/gt: (N, 7) -> (N,)."""
    pred_corners = box_ops.boxes_to_corners_3d(pred_boxes)
    gt_corners = box_ops.boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(jnp.pi)
    gt_corners_flip = box_ops.boxes_to_corners_3d(gt_flip)

    def safe_norm(d):
        # d/||d|| is NaN at exactly-coincident corners; keep the gradient
        # bounded there (norm(0) ~ 0 with zero grad instead of NaN)
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)

    dist = jnp.minimum(
        safe_norm(pred_corners - gt_corners),
        safe_norm(pred_corners - gt_corners_flip),
    )  # (N, 8)
    return jnp.mean(smooth_l1(dist, beta=1.0), axis=1)


def centerhead_iou_loss(iou_preds: jax.Array, decoded_boxes: jax.Array,
                        mask: jax.Array, gt_boxes_src: jax.Array) -> jax.Array:
    """IoU-prediction regression (`loss_utils.calculate_iou_loss_centerhead`,
    `pcdet/utils/loss_utils.py:610-634`): L1 between the predicted IoU channel
    (already gathered at target inds, (B, K)) and the actual aligned 3D IoU of
    the decoded boxes vs the raw gt boxes, remapped [0,1] -> [-1,1].

    decoded_boxes/gt_boxes_src: (B, K, 7); mask: (B, K)."""
    from . import iou3d
    B, K = iou_preds.shape
    flat_p = jax.lax.stop_gradient(decoded_boxes.reshape(B * K, 7))
    flat_g = gt_boxes_src[..., :7].reshape(B * K, 7)
    iou_target = iou3d.boxes_aligned_iou3d(flat_p, flat_g).reshape(B, K)
    iou_target = iou_target * 2.0 - 1.0
    m = mask.astype(jnp.float32)
    err = jnp.abs(iou_preds - jax.lax.stop_gradient(iou_target)) * m
    return jnp.sum(err) / jnp.clip(jnp.sum(m), 1e-4)


def centerhead_iou_reg_loss(decoded_boxes: jax.Array, mask: jax.Array,
                            gt_boxes_src: jax.Array) -> jax.Array:
    """DIoU box regression (`loss_utils.calculate_iou_reg_loss_centerhead`,
    `pcdet/utils/loss_utils.py:637-648`): mean (1 - DIoU) over valid slots."""
    from . import iou3d
    B, K, _ = decoded_boxes.shape
    diou = iou3d.bbox3d_overlaps_diou(decoded_boxes.reshape(B * K, 7),
                                      gt_boxes_src[..., :7].reshape(B * K, 7))
    m = mask.astype(jnp.float32).reshape(B * K)
    return jnp.sum((1.0 - diou) * m) / jnp.clip(jnp.sum(m), 1e-4)
