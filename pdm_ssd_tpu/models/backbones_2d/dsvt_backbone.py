"""DSVT-style window-attention BEV backbone — dense TPU recast.

Re-design of the reference `DSVT` (`pcdet/models/backbones_3d/dsvt.py:10-616`):
the reference runs set attention over SPARSE voxels, partitioned into
rotating x/y windows with `ingroup_inds` (a CUDA atomic-counter kernel) and
padding-aware masks. On the dense TPU pipeline the BEV grid is already a
fixed lattice, so window partitioning is a static reshape, the in-window
ordinal is the lattice index itself (no `ingroup_inds` needed), and the
alternating x/y "rotation" becomes alternating window orientation; empty
cells are masked out of attention by occupancy. Stages reduce resolution by
strided pooling (reduction_type 'maxpool'/'linear' analog).

Consumes 'spatial_features' (B, H, W, C) — e.g. from PointPillarScatter —
and writes 'spatial_features_2d'.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...utils.config import as_cfg


class WindowSelfAttention(nn.Module):
    """Multi-head self-attention within fixed windows + FFN (one DSVT block)."""
    d_model: int
    nhead: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, x, mask, training: bool = False):
        """x: (B*nw, S, C); mask: (B*nw, S) bool valid."""
        attn_mask = mask[:, None, None, :]                 # key mask
        h = nn.LayerNorm(name='ln1')(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            name='attn')(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm(name='ln2')(x)
        h = nn.Dense(self.dim_feedforward, name='ff1')(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, name='ff2')(h)
        return x + h


class DSVTBackbone(nn.Module):
    """Config: WINDOW_SHAPE [wx, wy], D_MODEL (list per stage), NHEAD,
    DIM_FEEDFORWARD, SET_INFO [[blocks per stage]...] via BLOCKS_PER_STAGE,
    STAGE_STRIDES."""
    model_cfg: Any
    input_channels: int

    @property
    def num_bev_features(self):
        return as_cfg(self.model_cfg).D_MODEL[-1]

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        x = batch['spatial_features']                      # (B, H, W, C)
        occ = jnp.any(jnp.abs(x) > 0, axis=-1)             # (B, H, W)
        wx, wy = cfg.get('WINDOW_SHAPE', [8, 8])
        d_models = list(cfg.D_MODEL)
        nheads = list(cfg.get('NHEAD', [4] * len(d_models)))
        dffs = list(cfg.get('DIM_FEEDFORWARD', [2 * d for d in d_models]))
        blocks = list(cfg.get('BLOCKS_PER_STAGE', [2] * len(d_models)))
        strides = list(cfg.get('STAGE_STRIDES', [1] + [2] * (len(d_models) - 1)))

        def window(x, m, axis_first):
            B, H, W, C = x.shape
            if axis_first == 'x':
                xw = x.reshape(B, H // wy, wy, W // wx, wx, C)
                xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wy * wx, C)
                mw = m.reshape(B, H // wy, wy, W // wx, wx)
                mw = mw.transpose(0, 1, 3, 2, 4).reshape(-1, wy * wx)
            else:  # y-major ordering inside the window (the DSVT rotation)
                xw = x.reshape(B, H // wy, wy, W // wx, wx, C)
                xw = xw.transpose(0, 1, 3, 4, 2, 5).reshape(-1, wx * wy, C)
                mw = m.reshape(B, H // wy, wy, W // wx, wx)
                mw = mw.transpose(0, 1, 3, 4, 2).reshape(-1, wx * wy)
            return xw, mw

        def unwindow(xw, shape, axis_first):
            B, H, W, C = shape
            if axis_first == 'x':
                xw = xw.reshape(B, H // wy, W // wx, wy, wx, C)
                return xw.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
            xw = xw.reshape(B, H // wy, W // wx, wx, wy, C)
            return xw.transpose(0, 1, 4, 2, 3, 5).reshape(B, H, W, C)

        for si, dm in enumerate(d_models):
            # pad H/W to window multiples
            B, H, W, C = x.shape
            ph = (-H) % wy
            pw = (-W) % wx
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                occ = jnp.pad(occ, ((0, 0), (0, ph), (0, pw)))
            x = nn.Dense(dm, name=f's{si}_proj')(x)
            for bi in range(blocks[si]):
                orient = 'x' if bi % 2 == 0 else 'y'
                xw, mw = window(x, occ, orient)
                xw = WindowSelfAttention(
                    dm, nheads[si], dffs[si],
                    name=f's{si}_block{bi}')(xw, mw, training=training)
                x = unwindow(xw, x.shape, orient)
            x = jnp.where(occ[..., None], x, 0.0)
            if strides[si] > 1:
                s = strides[si]
                x = nn.max_pool(x, (s, s), strides=(s, s), padding='SAME')
                occ = nn.max_pool(occ[..., None].astype(jnp.float32), (s, s),
                                  strides=(s, s), padding='SAME')[..., 0] > 0.5

        batch['spatial_features_2d'] = x
        return batch
