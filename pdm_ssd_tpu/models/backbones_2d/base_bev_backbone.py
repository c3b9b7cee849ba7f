"""2D BEV conv backbone, NHWC.

Re-design of the reference `BaseBEVBackbone`
(`pcdet/models/backbones_2d/base_bev_backbone.py:6-112`): config-driven
downsampling Conv-BN-ReLU stacks + transpose-conv up blocks, concatenated to
`spatial_features_2d`. Channels-last for TPU; convs are large NHWC matmuls on
the MXU.

Config schema (same as reference): LAYER_NUMS, LAYER_STRIDES, NUM_FILTERS,
UPSAMPLE_STRIDES, NUM_UPSAMPLE_FILTERS.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...utils.config import as_cfg


class BaseBEVBackbone(nn.Module):
    model_cfg: Any
    input_channels: int

    @property
    def num_bev_features(self):
        cfg = as_cfg(self.model_cfg)
        up_filters = cfg.get('NUM_UPSAMPLE_FILTERS', [])
        if len(up_filters) > 0:
            c = sum(up_filters)
            # reference adds an extra downsample block when len(UP) > len(LAYERS)
            return c
        return cfg.NUM_FILTERS[-1]

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        x = batch['spatial_features']  # (B, H, W, C)
        cfg = as_cfg(self.model_cfg)
        layer_nums = cfg.get('LAYER_NUMS', [])
        layer_strides = cfg.get('LAYER_STRIDES', [])
        num_filters = cfg.get('NUM_FILTERS', [])
        up_strides = cfg.get('UPSAMPLE_STRIDES', [])
        up_filters = cfg.get('NUM_UPSAMPLE_FILTERS', [])

        ups = []
        for i in range(len(layer_nums)):
            x = nn.Conv(num_filters[i], (3, 3), strides=(layer_strides[i], layer_strides[i]),
                        padding=1, use_bias=False, name=f'down{i}_conv0')(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3, name=f'down{i}_bn0')(x)
            x = nn.relu(x)
            for k in range(layer_nums[i]):
                x = nn.Conv(num_filters[i], (3, 3), padding=1, use_bias=False,
                            name=f'down{i}_conv{k + 1}')(x)
                x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                                 epsilon=1e-3, name=f'down{i}_bn{k + 1}')(x)
                x = nn.relu(x)
            if i < len(up_strides):
                s = up_strides[i]
                if s >= 1:
                    u = nn.ConvTranspose(up_filters[i], (s, s), strides=(s, s),
                                         use_bias=False, name=f'up{i}_deconv')(x)
                else:
                    s = int(round(1 / s))
                    u = nn.Conv(up_filters[i], (s, s), strides=(s, s), use_bias=False,
                                name=f'up{i}_conv')(x)
                u = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                                 epsilon=1e-3, name=f'up{i}_bn')(u)
                ups.append(nn.relu(u))

        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif len(ups) == 1:
            x = ups[0]

        if len(up_strides) > len(layer_nums):
            s = up_strides[-1]
            x = nn.ConvTranspose(sum(up_filters), (s, s), strides=(s, s),
                                 use_bias=False, name='up_final_deconv')(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3, name='up_final_bn')(x)
            x = nn.relu(x)

        batch['spatial_features_2d'] = x
        return batch


class BasicResBlock(nn.Module):
    """Conv-BN-ReLU-Conv-BN + identity (reference `BasicBlock`,
    `base_bev_backbone.py:204-249`), NHWC."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        identity = x
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name='conv1')(x)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3, name='bn1')(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name='conv2')(h)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3, name='bn2')(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name='down_conv')(x)
            identity = nn.BatchNorm(use_running_average=not training,
                                    momentum=0.99, epsilon=1e-3,
                                    name='down_bn')(identity)
        return nn.relu(h + identity)


class BaseBEVResBackbone(nn.Module):
    """Residual variant (`BaseBEVResBackbone`, `base_bev_backbone.py:252-330`):
    same config schema as `BaseBEVBackbone`, residual blocks instead of plain
    conv stacks."""
    model_cfg: Any
    input_channels: int

    @property
    def num_bev_features(self):
        cfg = as_cfg(self.model_cfg)
        up_filters = cfg.get('NUM_UPSAMPLE_FILTERS', [])
        if len(up_filters) > 0:
            return sum(up_filters)
        return cfg.NUM_FILTERS[-1]

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        x = batch['spatial_features']
        cfg = as_cfg(self.model_cfg)
        layer_nums = cfg.get('LAYER_NUMS', [])
        layer_strides = cfg.get('LAYER_STRIDES', [])
        num_filters = cfg.get('NUM_FILTERS', [])
        up_strides = cfg.get('UPSAMPLE_STRIDES', [])
        up_filters = cfg.get('NUM_UPSAMPLE_FILTERS', [])

        ups = []
        for i in range(len(layer_nums)):
            x = BasicResBlock(num_filters[i], layer_strides[i],
                              name=f'stage{i}_block0')(x, training)
            for k in range(layer_nums[i]):
                x = BasicResBlock(num_filters[i],
                                  name=f'stage{i}_block{k + 1}')(x, training)
            if i < len(up_strides):
                s = up_strides[i]
                if s >= 1:
                    u = nn.ConvTranspose(up_filters[i], (s, s), strides=(s, s),
                                         use_bias=False, name=f'up{i}_deconv')(x)
                else:
                    ss = int(round(1 / s))
                    u = nn.Conv(up_filters[i], (ss, ss), strides=(ss, ss),
                                use_bias=False, name=f'up{i}_conv')(x)
                u = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.99, epsilon=1e-3,
                                 name=f'up{i}_bn')(u)
                ups.append(nn.relu(u))
        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif len(ups) == 1:
            x = ups[0]
        batch['spatial_features_2d'] = x
        return batch
