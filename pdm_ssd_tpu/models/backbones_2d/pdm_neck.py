"""PDM neck: Point Dilation Mechanism (the PDM-SSD core contribution).

There is no reference implementation in the snapshot (SURVEY.md §0) — the design
follows the paper abstract embedded in the reference `README.md:12`:

  "expand the sampled points into grids of a fixed size (point dilation);
   fill features via spherical-harmonic coefficients and Gaussian density,
   fusing across dilation centers; height-compress into a (sparse) BEV grid;
   run a scene heatmap off that grid to complement the vote-point set."

TPU-native formulation (designed for XLA, not translated from CUDA):

1. Dilation centers = the last SA level's sampled points (B, M, 3) + features
   (B, M, C) from the point backbone.
2. Every center dilates into a fixed G_x x G_y x G_z window of global grid
   cells around its own cell. For each cell we know the continuous offset
   `o` from the center.
3. Feature filling is one batched matmul: center features are linearly
   projected to `n_sh` spherical-harmonic coefficient vectors (M, n_sh, C');
   the cell's solid-harmonic basis vector Y(o) (n_sh,) contracts against them:
   cell_feat = gaussian(o) * Y(o) @ coeffs.   (MXU-shaped: (M*G^3, n_sh) x
   (n_sh, C') per batch.)
4. Multi-center fusion = scatter-add of all M*G^3 cell contributions into the
   dense (H, W, D_z) grid (plus a scattered density channel); XLA lowers this
   to an efficient sort-based scatter; a fused Pallas kernel replaces it on
   the hot path.
5. Height compression folds D_z into channels (reference pattern
   `height_compression.py:10-26`) giving `spatial_features` (B, H, W, D_z*C').

Solid harmonics (r^l Y_lm, polynomial in o, smooth at o=0) up to degree 2 give
n_sh = 9 basis functions.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.config import as_cfg


def solid_harmonics_deg2(o: jax.Array) -> jax.Array:
    """Real solid harmonics r^l*Y_lm for l<=2 of offsets o (..., 3) -> (..., 9).
    Polynomial basis: [1, x, y, z, xy, yz, 3z^2-r^2, xz, x^2-y^2]."""
    x, y, z = o[..., 0], o[..., 1], o[..., 2]
    r2 = x * x + y * y + z * z
    return jnp.stack([
        jnp.ones_like(x), x, y, z,
        x * y, y * z, 3 * z * z - r2, x * z, x * x - y * y,
    ], axis=-1)


class PDMNeck(nn.Module):
    """Config keys (new; PDM has no reference YAML):
        GRID_KERNEL: [Gx, Gy, Gz] dilation window in cells (odd).
        NUM_BEV_FEATURES: C' per z-bin.
        BEV_SIZE: [W, H] of the BEV grid (cells).
        NUM_Z_BINS: D_z z bins.
        POINT_CLOUD_RANGE / VOXEL_SIZE (bev cell [vx, vy, vz]).
        GAUSSIAN_SIGMA: sigma in cell units for the density weight.
        SOURCE_LEVEL: which SA level provides dilation centers (-1 = last).
    """
    model_cfg: Any
    input_channels: int

    @property
    def num_bev_features(self):
        cfg = as_cfg(self.model_cfg)
        # +1: a scattered Gaussian-density channel rides along per z-bin
        return (cfg.NUM_BEV_FEATURES + 1) * cfg.NUM_Z_BINS

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        lvl = cfg.get('SOURCE_LEVEL', -1)
        centers = batch['sa_xyz'][lvl]          # (B, M, 3)
        feats = batch['sa_features'][lvl]       # (B, M, C)
        B, M, C = feats.shape

        gx, gy, gz = cfg.GRID_KERNEL
        W, H = cfg.BEV_SIZE
        Dz = cfg.NUM_Z_BINS
        vx, vy, vz = cfg.VOXEL_SIZE
        pc_range = np.asarray(cfg.POINT_CLOUD_RANGE, np.float32)
        Cout = cfg.NUM_BEV_FEATURES
        sigma = cfg.get('GAUSSIAN_SIGMA', 1.0)

        n_sh = 9
        # SH coefficient projection: (B, M, C) -> (B, M, n_sh * Cout)
        coeffs = nn.Dense(n_sh * Cout, use_bias=False, name='sh_proj')(feats)
        coeffs = coeffs.reshape(B, M, n_sh, Cout)

        # window offsets in cells, (G3, 3)
        offs = np.stack(np.meshgrid(
            np.arange(gx) - gx // 2, np.arange(gy) - gy // 2,
            np.arange(gz) - gz // 2, indexing='ij'), axis=-1).reshape(-1, 3)
        offs = jnp.asarray(offs, jnp.int32)
        G3 = offs.shape[0]
        cell = jnp.asarray([vx, vy, vz], jnp.float32)

        # center cell (continuous + integer)
        rel = (centers - pc_range[:3]) / cell                      # (B, M, 3)
        c_cell = jnp.floor(rel).astype(jnp.int32)
        cell_idx = c_cell[:, :, None, :] + offs[None, None, :, :]  # (B, M, G3, 3)
        # continuous offset from center to each cell's center, in cell units
        o = (cell_idx.astype(jnp.float32) + 0.5) - rel[:, :, None, :]

        basis = solid_harmonics_deg2(o / max(float(sigma), 1e-6))  # (B, M, G3, 9)
        gauss = jnp.exp(-0.5 * jnp.sum(o * o, axis=-1) / (sigma ** 2))  # (B, M, G3)

        # cell features: contract basis against coeffs -> (B, M, G3, Cout)
        cell_feats = jnp.einsum('bmgs,bmsc->bmgc', basis, coeffs,
                                preferred_element_type=jnp.float32)
        cell_feats = cell_feats * gauss[..., None]

        # multi-center fusion: scatter-add with the z axis FOLDED INTO CHANNELS.
        # XLA's TPU scatter lowering costs ~O(target_rows + updates) (sort
        # based), so shrinking the target from H*W*Dz rows to H*W rows and the
        # update count by the Gz factor cuts the fuse step ~8x (43 -> ~6 ms at
        # the KITTI point-config shapes).
        ix, iy, iz = cell_idx[..., 0], cell_idx[..., 1], cell_idx[..., 2]
        ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < Dz)
        if 'sa_mask' in batch and batch['sa_mask'] is not None:
            ok = ok & batch['sa_mask'][lvl][:, :, None]

        payload = jnp.concatenate([cell_feats, gauss[..., None]], axis=-1)
        Cp = Cout + 1
        Gxy, Gz = gx * gy, gz
        # (B, M, Gxy, Gz, ...) split: meshgrid was (x, y, z) row-major in z
        iz_s = iz.reshape(B, M, Gxy, Gz)
        ok_s = ok.reshape(B, M, Gxy, Gz)
        pay_s = payload.reshape(B, M, Gxy, Gz, Cp)
        z_iota = jnp.arange(Dz, dtype=jnp.int32)
        # combine the Gz z-offsets into (Dz * Cp) channels before scattering;
        # ONE one-hot contraction over Gz instead of a Gz-step accumulate
        # (each accumulate step re-read+wrote the full (B,M,Gxy,Dz,Cp)
        # tensor: ~1.8 -> ~0.5 ms at the point-config shapes)
        zoh = ((iz_s[..., None] == z_iota) & ok_s[..., None]
               ).astype(jnp.float32)                        # (B,M,Gxy,Gz,Dz)
        # default (bf16) matmul precision: pay_s is itself the product of
        # bf16-precision matmuls (sh_proj, basis contraction), so the 0/1
        # selection rounding adds no new error class; HIGHEST costs ~1 ms
        rows = jax.lax.dot_general(
            zoh, pay_s, (((3,), (3,)), ((0, 1, 2), (0, 1, 2))),
            preferred_element_type=jnp.float32)             # (B,M,Gxy,Dz,Cp)
        rows = rows.reshape(B, M * Gxy, Dz * Cp)

        ok_xy = jnp.any(ok_s, axis=-1)                              # (B, M, Gxy)
        n_xy = H * W
        # OOB windows scatter to row 0: their update rows are exactly zero
        # (zoh is ok-masked), so no dump row / final slice-copy is needed
        flat = jnp.where(ok_xy, iy.reshape(B, M, Gxy, Gz)[..., 0] * W
                         + ix.reshape(B, M, Gxy, Gz)[..., 0], 0)
        boff = (jnp.arange(B, dtype=jnp.int32) * n_xy)[:, None]
        fi = (flat.reshape(B, M * Gxy) + boff).reshape(-1)
        grid = jnp.zeros((B * n_xy, Dz * Cp), jnp.float32)
        grid = grid.at[fi].add(rows.reshape(-1, Dz * Cp))
        grid = grid.reshape(B, H, W, Dz * Cp)
        # height compression = fold z into channels (height_compression.py:10-26)
        batch['spatial_features'] = grid
        batch['spatial_features_stride'] = 1
        return batch
