"""Categorical-depth supervision for CaDDN (VERDICT r2 item 4).

Re-implements the reference DDN loss stack —
`pcdet/models/backbones_3d/vfe/image_vfe_modules/ffn/ddn_loss/ddn_loss.py`
(multi-class focal over D+1 depth bins), `balancer.py` (foreground/background
pixel re-weighting from 2D gt boxes) and `pcdet/utils/transform_utils.py:
bin_depths` (UD / LID / SID discretizations) — as pure jnp, fixed-shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bin_depths(depth_map, mode='LID', depth_min=2.0, depth_max=46.8,
               num_bins=80, target=False):
    """Depth map -> (fractional) bin indices (`transform_utils.bin_depths`).
    With target=True, out-of-range/non-finite pixels get index `num_bins`
    (the "beyond range" class) and the result is int32."""
    if mode == 'UD':
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == 'LID':
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * jnp.sqrt(
            jnp.clip(1 + 8 * (depth_map - depth_min) / bin_size, 0.0))
    elif mode == 'SID':
        indices = num_bins * (jnp.log(1 + depth_map) - np.log(1 + depth_min)) \
            / (np.log(1 + depth_max) - np.log(1 + depth_min))
    else:
        raise NotImplementedError(mode)
    if target:
        bad = (indices < 0) | (indices > num_bins) | ~jnp.isfinite(indices) \
            | (depth_map < depth_min)
        return jnp.where(bad, num_bins, indices).astype(jnp.int32)
    return indices


def compute_fg_mask(gt_boxes2d, shape, downsample_factor=1, box_mask=None):
    """(B, H, W) bool: pixels inside any (downsampled) 2D gt box
    (`loss_utils.compute_fg_mask`). gt_boxes2d: (B, N, 4) [u1, v1, u2, v2]
    in full-image pixels."""
    B, H, W = shape
    boxes = gt_boxes2d / downsample_factor
    u1 = jnp.floor(boxes[..., 0])
    v1 = jnp.floor(boxes[..., 1])
    u2 = jnp.ceil(boxes[..., 2])
    v2 = jnp.ceil(boxes[..., 3])
    if box_mask is None:
        box_mask = jnp.any(gt_boxes2d != 0, axis=-1)
    uu = jnp.arange(W)[None, None, :, None]
    vv = jnp.arange(H)[None, :, None, None]
    inside = (uu >= u1[:, None, None, :]) & (uu < u2[:, None, None, :]) \
        & (vv >= v1[:, None, None, :]) & (vv < v2[:, None, None, :]) \
        & box_mask[:, None, None, :]
    return jnp.any(inside, axis=-1)


def ddn_loss(depth_logits, depth_maps, gt_boxes2d, box_mask=None,
             weight=3.0, alpha=0.25, gamma=2.0, fg_weight=13.0,
             bg_weight=1.0, downsample_factor=1, disc_cfg=None):
    """Focal CE over D+1 depth bins + fg/bg balancing.

    depth_logits: (B, H, W, D+1); depth_maps: (B, H, W) metres (already
    downsampled to the feature resolution); gt_boxes2d: (B, N, 4) full-res.
    Returns (scalar loss, tb_dict). Matches `DDNLoss.forward` with kornia's
    FocalLoss semantics: -alpha * (1 - p_t)^gamma * log(p_t).
    """
    disc_cfg = disc_cfg or {}
    num_bins = depth_logits.shape[-1] - 1
    target = bin_depths(depth_maps, mode=disc_cfg.get('mode', 'LID'),
                        depth_min=disc_cfg.get('depth_min', 2.0),
                        depth_max=disc_cfg.get('depth_max', 46.8),
                        num_bins=num_bins, target=True)
    logp = jax.nn.log_softmax(depth_logits, axis=-1)
    logp_t = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    p_t = jnp.exp(logp_t)
    loss = -alpha * jnp.power(1.0 - p_t, gamma) * logp_t        # (B, H, W)

    fg = compute_fg_mask(gt_boxes2d, loss.shape, downsample_factor, box_mask)
    weights = jnp.where(fg, fg_weight, bg_weight)
    num_pixels = float(np.prod(loss.shape))
    fg_loss = jnp.sum(jnp.where(fg, loss * weights, 0.0)) / num_pixels
    bg_loss = jnp.sum(jnp.where(fg, 0.0, loss * weights)) / num_pixels
    total = (fg_loss + bg_loss) * weight
    return total, {'ddn_loss': total, 'ddn_fg_loss': fg_loss,
                   'ddn_bg_loss': bg_loss}
