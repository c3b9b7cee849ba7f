"""Depth-aware Lift-Splat view transform (camera -> BEV), NHWC.

Re-design of `DepthLSSTransform`
(`pcdet/models/view_transforms/depth_lss.py:15-257`): a static image-plane
frustum lifts each camera feature cell into D depth hypotheses weighted by a
predicted depth distribution (conditioned on a sparse lidar depth map through
`dtransform`), projects the frustum into lidar coordinates with the camera
geometry, and sum-pools into the BEV grid via `ops/bev_pool` (fixed-shape
folded-target scatter instead of the CUDA interval-sum).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.bev_pool import bev_pool
from ...utils.config import as_cfg


def _conv_bn_relu(x, ch, k, stride, name_prefix, training, use_bias=False):
    x = nn.Conv(ch, (k, k), strides=(stride, stride), padding=k // 2,
                use_bias=use_bias, name=f'{name_prefix}_conv')(x)
    x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                     epsilon=1e-5, name=f'{name_prefix}_bn')(x)
    return nn.relu(x)


class DepthLSSTransform(nn.Module):
    """Config: IN_CHANNEL, OUT_CHANNEL, IMAGE_SIZE [H, W], FEATURE_SIZE
    [fH, fW], XBOUND/YBOUND/ZBOUND [min, max, step], DBOUND [min, max, step],
    DOWNSAMPLE.

    Batch inputs: 'camera_feats' (B, N, fH, fW, C_in), 'camera_depth'
    (B, N, iH, iW, 1) sparse lidar depth, 'camera2lidar' (B, N, 4, 4),
    'camera_intrinsics' (B, N, 3, 3), optional 'img_aug_matrix' (B, N, 4, 4).
    Output: batch['spatial_features'] (B, Y, X, Z*OUT_CHANNEL).
    """
    model_cfg: Any

    @property
    def num_bev_features(self):
        cfg = as_cfg(self.model_cfg)
        nz = int(round((cfg.ZBOUND[1] - cfg.ZBOUND[0]) / cfg.ZBOUND[2]))
        return cfg.OUT_CHANNEL * max(nz, 1)

    def _grid(self):
        cfg = as_cfg(self.model_cfg)
        dx = np.array([cfg.XBOUND[2], cfg.YBOUND[2], cfg.ZBOUND[2]])
        bx = np.array([cfg.XBOUND[0], cfg.YBOUND[0], cfg.ZBOUND[0]]) + dx / 2
        nx = np.round(np.array([
            (cfg.XBOUND[1] - cfg.XBOUND[0]) / dx[0],
            (cfg.YBOUND[1] - cfg.YBOUND[0]) / dx[1],
            (cfg.ZBOUND[1] - cfg.ZBOUND[0]) / dx[2]])).astype(int)
        return dx, bx, nx

    def _frustum(self):
        cfg = as_cfg(self.model_cfg)
        iH, iW = cfg.IMAGE_SIZE
        fH, fW = cfg.FEATURE_SIZE
        ds = np.arange(*cfg.DBOUND, dtype=np.float32)
        D = len(ds)
        xs = np.linspace(0, iW - 1, fW, dtype=np.float32)
        ys = np.linspace(0, iH - 1, fH, dtype=np.float32)
        f = np.zeros((D, fH, fW, 3), np.float32)
        f[..., 0] = xs[None, None, :]
        f[..., 1] = ys[None, :, None]
        f[..., 2] = ds[:, None, None]
        return f  # (D, fH, fW, 3) image-plane (u, v, depth)

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        feats = batch['camera_feats']                      # (B, N, fH, fW, Cin)
        depth = batch['camera_depth']                      # (B, N, iH, iW, 1)
        c2l = batch['camera2lidar']                        # (B, N, 4, 4)
        intr = batch['camera_intrinsics']                  # (B, N, 3|4, 3|4)
        intr = intr[..., :3, :3]   # dataset ships 4x4 homogeneous intrinsics
        B, N, fH, fW, Cin = feats.shape
        C = cfg.OUT_CHANNEL
        frustum = jnp.asarray(self._frustum())
        D = frustum.shape[0]

        # dtransform on the sparse depth map (`depth_lss.py:42-53`)
        d = depth.reshape(B * N, *depth.shape[2:])
        d = _conv_bn_relu(d, 8, 1, 1, 'dt0', training)
        d = _conv_bn_relu(d, 32, 5, 4, 'dt1', training)
        d = _conv_bn_relu(d, 64, 5, 2, 'dt2', training)
        # depthnet: image feats + depth feats -> D logits + C context
        x = jnp.concatenate([d, feats.reshape(B * N, fH, fW, Cin)], axis=-1)
        x = _conv_bn_relu(x, Cin, 3, 1, 'dn0', training)
        x = _conv_bn_relu(x, Cin, 3, 1, 'dn1', training)
        x = nn.Conv(D + C, (1, 1), name='dn_out')(x)
        dist = jax.nn.softmax(x[..., :D], axis=-1)         # (BN, fH, fW, D)
        ctx = x[..., D:D + C]
        lifted = dist[..., None] * ctx[..., None, :]       # (BN, fH, fW, D, C)
        lifted = lifted.reshape(B, N, fH, fW, D, C)
        lifted = jnp.moveaxis(lifted, 4, 2)                # (B, N, D, fH, fW, C)

        # geometry: image-plane frustum -> lidar frame (`get_geometry:90-120`)
        pts = jnp.broadcast_to(frustum[None, None],
                               (B, N, D, fH, fW, 3))
        if 'img_aug_matrix' in batch:
            aug = batch['img_aug_matrix']
            inv = jnp.linalg.inv(aug[..., :3, :3])
            pts = pts - aug[..., None, None, None, :3, 3]
            pts = jnp.einsum('bnij,bndhwj->bndhwi', inv, pts)
        pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]],
                              axis=-1)
        combine = jnp.einsum('bnij,bnjk->bnik', c2l[..., :3, :3],
                             jnp.linalg.inv(intr))
        pts = jnp.einsum('bnij,bndhwj->bndhwi', combine, pts) \
            + c2l[..., None, None, None, :3, 3]

        dx, bx, nx = self._grid()
        coords = jnp.floor((pts - jnp.asarray(bx - dx / 2.0))
                           / jnp.asarray(dx)).astype(jnp.int32)
        P = N * D * fH * fW
        out = bev_pool(lifted.reshape(B, P, C), coords.reshape(B, P, 3),
                       jnp.ones((B, P), bool), tuple(int(v) for v in nx))

        if int(cfg.get('DOWNSAMPLE', 1)) > 1:
            s = int(cfg.DOWNSAMPLE)
            out = _conv_bn_relu(out, out.shape[-1], 3, 1, 'ds0', training)
            out = _conv_bn_relu(out, out.shape[-1], 3, s, 'ds1', training)
            out = _conv_bn_relu(out, out.shape[-1], 3, 1, 'ds2', training)
        batch['spatial_features'] = out
        batch['spatial_features_stride'] = int(cfg.get('DOWNSAMPLE', 1))
        return batch
