"""Box target encodings, pure JAX.

Functional re-implementations of `pcdet/utils/box_coder_utils.py`:
- `ResidualCoder` (anchor-relative, diagonal-normalized; `box_coder_utils.py:5-77`)
- `PointResidualCoder` (point-relative with per-class mean sizes, heading encoded
  as cos/sin; `box_coder_utils.py:144-222`)

Coders are stateless dataclasses; encode/decode are vectorized over leading dims.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResidualCoder:
    code_size: int = 7
    encode_angle_by_sincos: bool = False

    @property
    def full_code_size(self):
        return self.code_size + (1 if self.encode_angle_by_sincos else 0)

    def encode(self, boxes: jax.Array, anchors: jax.Array) -> jax.Array:
        anchors = anchors.at[..., 3:6].set(jnp.clip(anchors[..., 3:6], min=1e-5))
        boxes = boxes.at[..., 3:6].set(jnp.clip(boxes[..., 3:6], min=1e-5))
        xa, ya, za, dxa, dya, dza, ra = jnp.moveaxis(anchors[..., :7], -1, 0)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.moveaxis(boxes[..., :7], -1, 0)
        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        extras = [boxes[..., 7 + i] - anchors[..., 7 + i] for i in range(boxes.shape[-1] - 7)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *extras], axis=-1)

    def decode(self, box_encodings: jax.Array, anchors: jax.Array) -> jax.Array:
        xa, ya, za, dxa, dya, dza, ra = jnp.moveaxis(anchors[..., :7], -1, 0)
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.moveaxis(box_encodings[..., :8], -1, 0)
            n_used = 8
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = jnp.moveaxis(box_encodings[..., :7], -1, 0)
            n_used = 7
        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        extras = [box_encodings[..., n_used + i] + anchors[..., 7 + i]
                  for i in range(anchors.shape[-1] - 7)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


@dataclasses.dataclass(frozen=True)
class PointResidualCoder:
    """Per-point residual coder with class mean sizes (`box_coder_utils.py:144-222`).

    mean_size: tuple of (dx, dy, dz) per class, 1-indexed by class id.
    """
    code_size: int = 8
    use_mean_size: bool = True
    mean_size: tuple = ()

    def _anchor_sizes(self, classes: jax.Array) -> jax.Array:
        ms = jnp.asarray(np.array(self.mean_size, np.float32))
        return ms[jnp.clip(classes - 1, 0, ms.shape[0] - 1)]

    def encode(self, gt_boxes: jax.Array, points: jax.Array,
               gt_classes: jax.Array | None = None) -> jax.Array:
        gt_boxes = gt_boxes.at[..., 3:6].set(jnp.clip(gt_boxes[..., 3:6], min=1e-5))
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.moveaxis(gt_boxes[..., :7], -1, 0)
        xa, ya, za = jnp.moveaxis(points[..., :3], -1, 0)
        if self.use_mean_size:
            sizes = self._anchor_sizes(gt_classes)
            dxa, dya, dza = jnp.moveaxis(sizes, -1, 0)
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        extras = [gt_boxes[..., 7 + i] for i in range(gt_boxes.shape[-1] - 7)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg), *extras], axis=-1)

    def decode(self, box_encodings: jax.Array, points: jax.Array,
               pred_classes: jax.Array | None = None) -> jax.Array:
        xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.moveaxis(box_encodings[..., :8], -1, 0)
        xa, ya, za = jnp.moveaxis(points[..., :3], -1, 0)
        if self.use_mean_size:
            sizes = self._anchor_sizes(pred_classes)
            dxa, dya, dza = jnp.moveaxis(sizes, -1, 0)
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        extras = [box_encodings[..., 8 + i] for i in range(box_encodings.shape[-1] - 8)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


def build_box_coder(name: str, **kwargs):
    registry = {
        'ResidualCoder': ResidualCoder,
        'PointResidualCoder': PointResidualCoder,
    }
    cls = registry[name]
    if name == 'PointResidualCoder' and 'mean_size' in kwargs:
        kwargs['mean_size'] = tuple(tuple(s) for s in kwargs['mean_size'])
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in kwargs.items() if k in fields})
