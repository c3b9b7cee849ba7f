"""MPPNet head: multi-frame proposal refinement with grouped transformers.

Re-design of `MPPNetHead` (`pcdet/models/roi_heads/mppnet_head.py:298-860`,
992 LoC + the memory bank) at the structure level the paper defines —
three-level feature hierarchy over a proposal TRAJECTORY:

1. per-frame in-box point sets (proxy points): `pool_roi_points` against the
   per-frame trajectory boxes, canonical per-frame coordinates + a time
   embedding (`crop_current_frame_points` / `get_proxy_points` analogs);
2. intra-group encoding: frames partitioned into NUM_GROUPS groups, each
   group's point set runs a transformer encoder layer and max-pools into a
   group token (the reference's grouped self-attention);
3. inter-group decoding: a learnable query cross-attends over the group
   tokens (the reference's cross-group attention + decoder), feeding the
   cls/reg FC branches; targets/losses from `RoIHeadTemplate`.

Batch inputs: 'points_multi_frame' (B, T, N, 4) ego-aligned frame stack and
optionally 'trajectory_rois' (B, T, R, 7); without trajectories the current
rois are reused for every frame (static-scene fallback).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import box_ops
from ...utils.config import as_cfg
from ..layers import FCStack, SharedMLP
from .roi_head_template import RoIHeadTemplate
from .pointrcnn_head import pool_roi_points


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int = 4

    @nn.compact
    def __call__(self, x, mask):
        """x: (S, L, C); mask: (S, L) valid."""
        h = nn.LayerNorm(name='ln1')(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            name='attn')(h, h, mask=mask[:, None, None, :])
        x = x + h
        h = nn.LayerNorm(name='ln2')(x)
        h = nn.Dense(2 * self.d_model, name='ff1')(h)
        h = nn.relu(h)
        return x + nn.Dense(self.d_model, name='ff2')(h)


class MPPNetHead(RoIHeadTemplate):
    """Config: NUM_FRAMES T, NUM_GROUPS G, SAMPLE_POINTS_PER_FRAME K,
    HIDDEN_CHANNEL, SHARED_FC, CLS_FC, REG_FC, NMS_CONFIG, TARGET_CONFIG,
    LOSS_CONFIG."""
    input_channels: int = 0

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        T = int(cfg.get('NUM_FRAMES', 4))
        G = int(cfg.get('NUM_GROUPS', 2))
        K = int(cfg.get('SAMPLE_POINTS_PER_FRAME', 32))
        d = int(cfg.get('HIDDEN_CHANNEL', 64))

        batch = self.proposal_layer(batch, training=training)
        if training and 'gt_boxes' in batch:
            batch['roi_targets'] = self.assign_targets(batch)
        rois = batch['rois']                              # (B, R, 7)
        B, R = rois.shape[:2]

        frames = batch['points_multi_frame']              # (B, T, N, 4)
        assert frames.shape[1] >= T
        traj = batch.get('trajectory_rois')
        per_frame = []
        per_mask = []
        for t in range(T):
            t_rois = traj[:, t] if traj is not None else rois
            pts_t = frames[:, t, :, :3]
            idx, valid = pool_roi_points(pts_t, t_rois[..., :7], K, extra=0.5,
                                         roi_mask=batch.get('roi_mask'))

            def gather(x, i):
                return jnp.take_along_axis(
                    x, i.reshape(i.shape[0], -1)[..., None], axis=1
                ).reshape(i.shape + (x.shape[-1],))

            pooled = gather(frames[:, t], idx)            # (B, R, K, 4)
            # canonical coords in the per-frame box
            local = pooled[..., :3] - t_rois[:, :, None, :3]
            local = box_ops.rotate_points_along_z(
                local.reshape(B * R, K, 3), -t_rois[..., 6].reshape(B * R)
            ).reshape(B, R, K, 3)
            tcol = jnp.full((B, R, K, 1), t / max(T - 1, 1), jnp.float32)
            enc = jnp.concatenate([local, pooled[..., 3:4], tcol], -1)
            per_frame.append(jnp.where(valid[..., None], enc, 0.0))
            per_mask.append(valid)

        # (B, R, T, K, 5) -> groups of T/G frames
        seq = jnp.stack(per_frame, axis=2)
        msk = jnp.stack(per_mask, axis=2)
        fpg = T // G
        seq = seq.reshape(B * R * G, fpg * K, 5)
        msk = msk.reshape(B * R * G, fpg * K)

        h = nn.Dense(d, name='point_embed')(seq)
        h = EncoderLayer(d, name='intra_group')(h, msk)
        # group token: masked max over the group's points
        h = jnp.where(msk[..., None], h, -jnp.inf)
        tok = jnp.max(h, axis=1)
        tok = jnp.where(jnp.isfinite(tok), tok, 0.0)
        tok = tok.reshape(B * R, G, d)

        # inter-group decoding: learnable query attends over group tokens
        query = self.param('traj_query', nn.initializers.normal(0.02), (1, 1, d))
        q = jnp.broadcast_to(query, (B * R, 1, d))
        q = nn.MultiHeadDotProductAttention(
            num_heads=int(cfg.get('NUM_HEADS', 4)), qkv_features=d,
            name='cross_group')(q, tok)
        x = jnp.concatenate([q[:, 0], tok.reshape(B * R, G * d)], -1)
        x = x.reshape(B, R, -1)

        x = SharedMLP(tuple(cfg.get('SHARED_FC', [128, 128])),
                      name='shared_fc')(x, training=training)
        rcnn_cls = FCStack(tuple(cfg.get('CLS_FC', [128])), 1,
                           name='cls_fc')(x, training=training)
        rcnn_reg = FCStack(tuple(cfg.get('REG_FC', [128])), 7,
                           name='reg_fc')(x, training=training)
        batch['rcnn_cls_preds'] = rcnn_cls
        batch['rcnn_reg_preds'] = rcnn_reg
        return batch
