"""PV-RCNN ROI head: keypoint grid pooling + refinement.

Re-design of `pcdet/models/roi_heads/pvrcnn_head.py` (grid-point set
abstraction over VSA keypoints via stacked ball query) for fixed shapes:

1. `roi_grid_pool` (reference :50-86): each ROI spawns a GRID_SIZE^3 lattice
   of grid points in its local frame (reference `get_dense_grid_points
   :88-101`).
2. Instead of a global stacked ball query per grid point, keypoints are
   pre-selected PER ROI (up to POOL_MAX_KEYPOINTS inside the ROI enlarged by
   2x the largest pool radius — `pool_roi_points` reuse), then every radius
   branch runs DENSE against that per-ROI set: distance matrix
   (B*R, G^3, P), triangular-matmul selection rank, one-hot-matmul
   extraction, shared MLP + max-pool — all MXU work, no hash query.
3. Shared FCs + cls/reg branches (reference :12-48) on the flattened grid
   features; targets/losses from `RoIHeadTemplate`.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import box_ops
from ...utils.config import as_cfg
from ..layers import FCStack, SharedMLP
from .roi_head_template import RoIHeadTemplate
from .pointrcnn_head import pool_roi_points


def dense_grid_points(rois: jax.Array, grid_size: int) -> jax.Array:
    """(B, R, 7) -> (B, R, G^3, 3) global-frame ROI grid points
    (`get_dense_grid_points`, reference :88-101)."""
    B, R = rois.shape[:2]
    g = grid_size
    idx = np.stack(np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                               indexing='ij'), -1).reshape(-1, 3)
    unit = (jnp.asarray(idx, jnp.float32) + 0.5) / g - 0.5       # (G3, 3)
    local = unit[None, None] * rois[:, :, None, 3:6]             # (B, R, G3, 3)
    G3 = g ** 3
    rot = box_ops.rotate_points_along_z(
        local.reshape(B * R, G3, 3), rois[..., 6].reshape(B * R)
    ).reshape(B, R, G3, 3)
    return rot + rois[:, :, None, :3]


def _rank_over_lanes(within: jax.Array, group: int = 32) -> jax.Array:
    """Exclusive prefix count over the last axis via triangular matmuls.
    within (..., P) with P % group == 0."""
    P = within.shape[-1]
    shape = within.shape
    w = within.astype(jnp.bfloat16).reshape(-1, P // group, group)
    r = jax.lax.broadcasted_iota(jnp.int32, (group, group), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (group, group), 1)
    tri_incl = (r >= c).astype(jnp.bfloat16).T
    incl = jax.lax.dot_general(w, tri_incl, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    gs = jnp.sum(w.astype(jnp.float32), axis=2)                  # (-1, P/g)
    ng = P // group
    r2 = jax.lax.broadcasted_iota(jnp.int32, (ng, ng), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (ng, ng), 1)
    stri = (r2 > c2).astype(jnp.bfloat16).T
    off = jax.lax.dot_general(gs.astype(jnp.bfloat16), stri,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    rank = (incl + off[..., None]).reshape(shape) - within.astype(jnp.float32)
    return rank


class PVRCNNHead(RoIHeadTemplate):
    """Config: GRID_SIZE, POOL_MAX_KEYPOINTS, ROI_GRID_POOL.{POOL_RADIUS,
    NSAMPLE, MLPS}, SHARED_FC, CLS_FC, REG_FC, DP_RATIO (ignored under BN),
    NMS_CONFIG{TRAIN,TEST}, TARGET_CONFIG, LOSS_CONFIG."""
    input_channels: int = 0

    @nn.compact
    def __call__(self, batch: dict, training: bool = False,
                 skip_proposals: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        pool_cfg = cfg.ROI_GRID_POOL
        g = int(cfg.get('GRID_SIZE', 6))
        G3 = g ** 3
        P = int(cfg.get('POOL_MAX_KEYPOINTS', 64))

        if not skip_proposals:  # PV-RCNN++ runs proposals before the pfe
            batch = self.proposal_layer(batch, training=training)
            if training and 'gt_boxes' in batch:
                batch['roi_targets'] = self.assign_targets(batch)
        rois = batch['rois']                                     # (B, R, 7)
        B, R = rois.shape[:2]

        kp = batch['point_coords']                               # (B, Nk, 3)
        kf = batch['point_features']                             # (B, Nk, C)
        C = kf.shape[-1]
        radii = [float(r) for r in pool_cfg.POOL_RADIUS]
        nsamples = [int(n) for n in pool_cfg.NSAMPLE]
        mlps = [list(m) for m in pool_cfg.MLPS]

        # per-ROI keypoint pre-selection (enlarged by the pooling reach)
        reach = 2.0 * max(radii)
        idx, valid = pool_roi_points(kp, rois, P, extra=reach,
                                     roi_mask=batch.get('roi_mask'))

        def gather(t, i):
            return jnp.take_along_axis(
                t, i.reshape(i.shape[0], -1)[..., None], axis=1
            ).reshape(i.shape + (t.shape[-1],))

        sel_xyz = gather(kp, idx)                                # (B, R, P, 3)
        sel_feat = gather(kf, idx)                               # (B, R, P, C)
        sel_feat = jnp.where(valid[..., None], sel_feat, 0.0)

        grid = dense_grid_points(rois, g)                        # (B, R, G3, 3)
        rel_all = sel_xyz[:, :, None, :, :] - grid[:, :, :, None, :]
        d2 = jnp.sum(rel_all * rel_all, axis=-1)                 # (B, R, G3, P)
        rel_bf = rel_all.astype(jnp.bfloat16)

        branch_outs = []
        for bi, (radius, K, mlp) in enumerate(zip(radii, nsamples, mlps)):
            within = (d2 < radius * radius) & valid[:, :, None, :]
            rank = _rank_over_lanes(within.reshape(B * R, G3, P))
            hits = jnp.sum(within, axis=-1).reshape(B * R, G3, 1)
            k_iota = jnp.arange(K, dtype=jnp.float32)[None, None, :]
            want = jnp.where(k_iota < hits, k_iota, 0.0)         # (BR, G3, K)
            onehot = ((rank.astype(jnp.bfloat16)[:, :, None, :]
                       == want.astype(jnp.bfloat16)[..., None])
                      * within.reshape(B * R, G3, P).astype(jnp.bfloat16)[:, :, None, :])
            branch_outs.append((onehot.reshape(B * R, G3 * K, P), mlp, K))

        # rel depends on the grid point, so extraction contracts per grid
        # point: (BR, G3, K, P) x (BR, G3, P, 3+H)
        feats_per_branch = []
        h1 = [int(m[0]) for m in mlps]
        pre = [nn.Dense(h1[i], use_bias=False, name=f'pre_feat_{i}')(sel_feat)
               for i in range(len(mlps))]
        for bi, (onehot, mlp, K) in enumerate(branch_outs):
            oh = onehot.reshape(B * R, G3, K, P)
            dn4 = (((3,), (2,)), ((0, 1), (0, 1)))
            grel = jax.lax.dot_general(
                oh, rel_bf.reshape(B * R, G3, P, 3), dn4,
                preferred_element_type=jnp.float32)              # (BR, G3, K, 3)
            pfeat = jnp.broadcast_to(
                pre[bi].reshape(B * R, 1, P, h1[bi]),
                (B * R, G3, P, h1[bi])).astype(jnp.bfloat16)
            gfeat = jax.lax.dot_general(oh, pfeat, dn4,
                                        preferred_element_type=jnp.float32)
            h = gfeat + nn.Dense(h1[bi], use_bias=False,
                                 name=f'pre_xyz_{bi}')(grel)
            h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, name=f'bn0_{bi}')(h)
            h = nn.relu(h)
            rest = list(mlp[1:])
            if rest:
                h = SharedMLP(rest, name=f'mlp_rest_{bi}')(h, training=training)
            feats_per_branch.append(jnp.max(h, axis=2))          # (BR, G3, C')

        pooled = jnp.concatenate(feats_per_branch, axis=-1)      # (BR, G3, SC)
        x = pooled.reshape(B, R, G3 * pooled.shape[-1])
        x = SharedMLP(tuple(cfg.get('SHARED_FC', [256, 256])),
                      name='shared_fc')(x, training=training)
        rcnn_cls = FCStack(tuple(cfg.get('CLS_FC', [256, 256])), 1,
                           name='cls_fc')(x, training=training)
        rcnn_reg = FCStack(tuple(cfg.get('REG_FC', [256, 256])), 7,
                           name='reg_fc')(x, training=training)
        batch['rcnn_cls_preds'] = rcnn_cls
        batch['rcnn_reg_preds'] = rcnn_reg
        return batch
