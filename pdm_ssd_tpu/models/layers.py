"""Shared flax building blocks.

Channels-last everywhere (TPU-native layout). The reference's
Conv2d(1x1)+BatchNorm2d+ReLU shared-MLP stacks (`pointnet2_modules.py:90-97`)
become Dense+BatchNorm+ReLU over the trailing channel dim — identical math,
MXU-friendly shape.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class SharedMLP(nn.Module):
    """Stack of Dense(bias=False) + BatchNorm + ReLU over the last axis."""
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x, training: bool = False):
        for c in self.channels:
            x = nn.Dense(c, use_bias=False, name=None)(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5)(x)
            x = nn.relu(x)
        return x


class FCStack(nn.Module):
    """`make_fc_layers` analog (`point_head_template.py:36-47`): hidden
    Dense(bias=False)+BN+ReLU blocks, then a final biased Dense."""
    hidden: Sequence[int]
    out_channels: int
    final_bias_init: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        for c in self.hidden:
            x = nn.Dense(c, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5)(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_channels,
                     bias_init=nn.initializers.constant(self.final_bias_init))(x)
        return x


class ConvBNReLU(nn.Module):
    """3x3 (or kxk) Conv + BN + ReLU on NHWC maps."""
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding='SAME',
                    use_bias=self.use_bias)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3)(x)
        return nn.relu(x)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray | None, axis: int) -> jnp.ndarray:
    """Max-pool that ignores invalid slots (reference max_pool2d over nsample,
    `pointnet2_modules.py:41-44`)."""
    if mask is None:
        return jnp.max(x, axis=axis)
    neg = jnp.finfo(x.dtype).min
    x = jnp.where(jnp.expand_dims(mask, -1), x, neg)
    out = jnp.max(x, axis=axis)
    # all-invalid groups -> 0 (matches grouping zeros rather than -inf)
    any_valid = jnp.any(mask, axis=axis)
    return jnp.where(jnp.expand_dims(any_valid, -1), out, 0.0)
