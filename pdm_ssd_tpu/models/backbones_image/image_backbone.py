"""Camera image backbone (the Swin/FPN slot of BEVFusion).

The reference uses `SwinTransformer` + `GeneralizedLSSFPN`
(`pcdet/models/backbones_image/swin.py`, `img_neck.py`); this stage-strided
residual conv pyramid with a top-down FPN fusion fills the same contract —
images (B, N, H, W, 3) -> per-camera feature maps (B, N, H/8, W/8, C) — the
window-attention Swin variant is a roadmap item (`DSVTBackbone` already
provides the windowed-attention machinery on BEV grids).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...utils.config import as_cfg
from ..backbones_2d.base_bev_backbone import BasicResBlock


class ConvImageBackbone(nn.Module):
    """Config: NUM_FILTERS (3 stages, strides 2/2/2 after a stride-2 stem),
    OUT_CHANNEL (FPN output at 1/8 resolution)."""
    model_cfg: Any

    @property
    def out_channels(self):
        return as_cfg(self.model_cfg).get('OUT_CHANNEL', 256)

    @nn.compact
    def __call__(self, images, training: bool = False):
        """images: (B, N, H, W, 3) -> (B, N, H//8, W//8, OUT_CHANNEL)."""
        cfg = as_cfg(self.model_cfg)
        filters = cfg.get('NUM_FILTERS', [64, 128, 256])
        B, N, H, W, _ = images.shape
        x = images.reshape(B * N, H, W, 3)
        x = nn.Conv(filters[0], (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, name='stem')(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name='stem_bn')(x)
        x = nn.relu(x)
        # stages at H/4, H/8, H/16 (stem already /2)
        feats = []
        for i, ch in enumerate(filters):
            x = BasicResBlock(ch, 2, name=f'stage{i}_b0')(x, training)
            x = BasicResBlock(ch, name=f'stage{i}_b1')(x, training)
            feats.append(x)
        # top-down FPN fusion, output at the 1/8 level (GeneralizedLSSFPN role)
        out_ch = self.out_channels
        top = nn.Conv(out_ch, (1, 1), name='lat_top')(feats[-1])
        lat = nn.Conv(out_ch, (1, 1), name='lat_mid')(feats[-2])
        up = jnp.repeat(jnp.repeat(top, 2, axis=1), 2, axis=2)
        up = up[:, :lat.shape[1], :lat.shape[2]]
        top = nn.Conv(out_ch, (3, 3), padding=1, name='fpn_out')(lat + up)
        _, h8, w8, _ = top.shape
        return top.reshape(B, N, h8, w8, out_ch)
