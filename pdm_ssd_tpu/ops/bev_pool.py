"""bev_pool: sum camera-frustum features into a BEV grid (Lift-Splat).

Re-design of the reference CUDA extension
(`pcdet/ops/bev_pool/src/bev_pool_cuda.cu:20-98` + the QuickCumsum trick in
`bev_pool.py:8-100`): the reference sorts points by cell rank and interval-
sums. On TPU this is one fixed-shape scatter-add with the z axis folded into
channels (scatter cost ~O(target_rows + updates); see BENCH_NOTES round-2
calibration) — no sort, no dynamic filtering: out-of-grid points route to a
dropped dump row.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bev_pool(feats: jax.Array, coords: jax.Array, valid: jax.Array,
             nx: tuple) -> jax.Array:
    """feats: (B, P, C) flattened frustum features; coords: (B, P, 3) int
    (ix, iy, iz) grid cells; valid: (B, P) bool.
    nx: (X, Y, Z) grid extents. Returns (B, Y, X, Z*C) (z folded into
    channels — the reference's final `cat(x.unbind(dim=2))` collapse)."""
    B, P, C = feats.shape
    X, Y, Z = (int(n) for n in nx)
    ix, iy, iz = coords[..., 0], coords[..., 1], coords[..., 2]
    ok = valid & (ix >= 0) & (ix < X) & (iy >= 0) & (iy < Y) \
        & (iz >= 0) & (iz < Z)

    n_xy = Y * X
    # z folded into channels: rows (B*(Y*X)+dump), channels Z*C
    zoh = (iz[..., None] == jnp.arange(Z)) & ok[..., None]     # (B, P, Z)
    wide = (zoh[..., None] * feats[:, :, None, :]).reshape(B, P, Z * C)
    row = jnp.where(ok, iy * X + ix, n_xy)
    boff = (jnp.arange(B, dtype=jnp.int32) * (n_xy + 1))[:, None]
    fi = (row + boff).reshape(-1)
    grid = jnp.zeros((B * (n_xy + 1), Z * C), feats.dtype)
    grid = grid.at[fi].add(wide.reshape(-1, Z * C))
    grid = grid.reshape(B, n_xy + 1, Z * C)[:, :n_xy]
    return grid.reshape(B, Y, X, Z * C)
