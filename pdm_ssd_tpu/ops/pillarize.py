"""Dynamic pillarization: points -> dense BEV grid, gather-free.

TPU-native equivalent of the reference's dynamic pillar VFE + scatter
(`pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py` + `PointPillarScatter`,
`map_to_bev/pointpillar_scatter.py:14-38`), fused into one scatter-add pass:
per-cell sums of decorated point features and the point count, normalized to
means. XLA's scatter-add runs at ~5ns/element on this hardware (vs ~40-300ns
gathers), making this the cheapest way to get points onto the grid — and once
on the grid, every neighborhood op is a convolution at full MXU rate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def pillarize(points: jax.Array, grid_wh: tuple, voxel_size: tuple,
              pc_range: tuple, mask: jax.Array | None = None) -> jax.Array:
    """points: (B, N, 3+F) -> dense pillar features (B, H, W, 3+F+1+3).

    Per-cell channels: [mean point features (3+F), log1p(count),
    mean offset from cell center (3)] — the decorated-centroid features of the
    reference PillarVFE (`pillar_vfe.py:8-124`) without the per-point MLP
    (the following conv layer plays that role at MXU speed).
    """
    B, N, C = points.shape
    W, H = grid_wh
    vx, vy = voxel_size[0], voxel_size[1]
    x0, y0 = pc_range[0], pc_range[1]

    ix = jnp.floor((points[..., 0] - x0) / vx).astype(jnp.int32)
    iy = jnp.floor((points[..., 1] - y0) / vy).astype(jnp.int32)
    ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    if mask is not None:
        ok = ok & mask
    ncells = H * W
    flat = jnp.where(ok, iy * W + ix, ncells)  # (B, N)

    # cell-center offsets
    cx = (ix.astype(jnp.float32) + 0.5) * vx + x0
    cy = (iy.astype(jnp.float32) + 0.5) * vy + y0
    off = jnp.stack([points[..., 0] - cx, points[..., 1] - cy], axis=-1)

    payload = jnp.concatenate([
        points, off, jnp.ones((B, N, 1), points.dtype)], axis=-1)  # (B,N,C+3)
    payload = jnp.where(ok[..., None], payload, 0.0)

    def scatter_one(fl, pay):
        grid = jnp.zeros((ncells + 1, payload.shape[-1]), jnp.float32)
        return grid.at[fl].add(pay)[:ncells]

    grid = jax.vmap(scatter_one)(flat, payload)  # (B, HW, C+3)
    cnt = grid[..., -1:]
    means = grid[..., :-1] / jnp.clip(cnt, min=1.0)
    feats = jnp.concatenate([means, jnp.log1p(cnt)], axis=-1)
    return feats.reshape(B, H, W, C + 3)
