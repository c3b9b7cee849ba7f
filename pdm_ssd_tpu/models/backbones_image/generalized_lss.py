"""GeneralizedLSSFPN image neck, NHWC flax.

Re-design of the reference `GeneralizedLSSFPN`
(`pcdet/models/backbones_image/img_neck/generalized_lss.py`): top-down
pyramid where each level concatenates its lateral input with the upsampled
coarser level (the coarsest concatenates the raw next backbone stage), then
1x1 lateral + 3x3 fpn BasicBlock2D convs (conv + BN + ReLU, reference
`model_utils/basic_block_2d.py`). Bilinear upsampling is
`jax.image.resize`.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.config import as_cfg


class BasicBlock2D(nn.Module):
    out_channels: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.out_channels,
                    (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, use_bias=False,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name='bn')(x)
        return nn.relu(x)


class GeneralizedLSSFPN(nn.Module):
    """Config: IN_CHANNELS (per input level), OUT_CHANNELS, NUM_OUTS,
    START_LEVEL, END_LEVEL (-1 = last)."""
    model_cfg: Any

    @property
    def out_channels(self):
        return int(as_cfg(self.model_cfg).OUT_CHANNELS)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], training: bool = False):
        """feats: list of (B, N, h_i, w_i, C_i), finest first.
        Returns list of (B, N, h_i, w_i, OUT_CHANNELS) for the used levels."""
        cfg = as_cfg(self.model_cfg)
        in_ch = list(cfg.IN_CHANNELS)
        out_ch = int(cfg.OUT_CHANNELS)
        start = int(cfg.get('START_LEVEL', 0))
        end = int(cfg.get('END_LEVEL', -1))
        n_used = (len(in_ch) - 1) if end == -1 else end
        assert len(feats) == len(in_ch), (len(feats), in_ch)

        B, N = feats[0].shape[:2]
        lat = [f.reshape(B * N, *f.shape[2:]) for f in feats]
        # top-down: level i gets cat(lateral_i, upsample(level_{i+1}))
        for i in range(n_used - 1 - start, start - 1, -1):
            up = jax.image.resize(
                lat[i + 1],
                (lat[i].shape[0], lat[i].shape[1], lat[i].shape[2],
                 lat[i + 1].shape[-1]), method='bilinear')
            x = jnp.concatenate([lat[i], up], axis=-1)
            x = BasicBlock2D(out_ch, 1, name=f'lateral_{i}')(x, training)
            lat[i] = BasicBlock2D(out_ch, 3, name=f'fpn_{i}')(x, training)
        return [lat[i].reshape(B, N, *lat[i].shape[1:])
                for i in range(start, n_used)]
