"""Camera/lidar BEV fuser (`pcdet/models/fuser/convfuser.py` analog):
concat both BEV maps and fuse with a conv."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...utils.config import as_cfg


class ConvFuser(nn.Module):
    model_cfg: Any

    @property
    def num_bev_features(self):
        return as_cfg(self.model_cfg).OUT_CHANNEL

    @nn.compact
    def __call__(self, lidar_bev, camera_bev, training: bool = False):
        cfg = as_cfg(self.model_cfg)
        x = jnp.concatenate([lidar_bev, camera_bev], axis=-1)
        x = nn.Conv(cfg.OUT_CHANNEL, (3, 3), padding=1, use_bias=False,
                    name='fuse_conv')(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name='fuse_bn')(x)
        return nn.relu(x)
