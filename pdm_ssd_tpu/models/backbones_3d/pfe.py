"""Point-feature extraction: VoxelSetAbstraction (PV-RCNN keypoints).

Re-design of `pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py:11-411`
for the dense TPU voxel pipeline:

- keypoints: FPS of the raw cloud to NUM_KEYPOINTS (`get_sampled_points`,
  reference :225-252); the sector-FPS variant (PV-RCNN++'s
  `sectorized_proposal_centric_sampling`, reference :254-335) ships at
  `ops/pointnet2.py` (`sector_fps`) and is wired below via
  SAMPLE_METHOD == 'SPC'.
- 'raw_points' source: fused multi-radius SA around the keypoints
  (`SA_rawpoints`, reference :160-166) via `SAGroupMLP`.
- 'x_conv1..4' sources: the reference runs stacked SA with voxel-hash queries
  over sparse voxel features (`voxel_query_gpu.cu`); here the neighborhood
  query is a fixed 3x3x3 window fetch around each keypoint's cell —
  occupancy-masked, relative-offset-conditioned MLP + max-pool. Two exact
  variants share weights: `VoxelNeighborAgg` reads the dense ladder's
  volumes; `SparseVoxelNeighborAgg` reads the sparse ladder's slot tables
  through a scattered slot-ID grid (the voxel-hash analog, TPU-first).
- 'bev' source: bilinear interpolation of `spatial_features` at keypoint xy
  (`interpolate_from_bev_features`, reference :177-203).
- fusion: Dense+BN+ReLU to NUM_OUTPUT_FEATURES (`vsa_point_feature_fusion`,
  reference :168-175).

Outputs: batch['point_coords'] (B, K, 3), batch['point_features'] (B, K, C),
batch['point_features_before_fusion'].
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pointnet2 import flat_gather
import numpy as np

from ...ops import dispatch
from ...utils.config import as_cfg
from .pointnet2_backbone import SAGroupMLP


def bilinear_from_bev(bev: jax.Array, keypoints: jax.Array, pc_range,
                      voxel_size, bev_stride: float) -> jax.Array:
    """bev (B, H, W, C), keypoints (B, K, 3) -> (B, K, C)."""
    B, H, W, C = bev.shape
    x = (keypoints[..., 0] - pc_range[0]) / voxel_size[0] / bev_stride
    y = (keypoints[..., 1] - pc_range[1]) / voxel_size[1] / bev_stride
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    flat = bev.reshape(B, H * W, C)

    def corner(dy, dx):
        idx = (y0 + dy) * W + (x0 + dx)
        return flat_gather(flat, idx)

    v00, v01 = corner(0, 0), corner(0, 1)
    v10, v11 = corner(1, 0), corner(1, 1)
    return (v00 * ((1 - fx) * (1 - fy))[..., None]
            + v01 * (fx * (1 - fy))[..., None]
            + v10 * ((1 - fx) * fy)[..., None]
            + v11 * (fx * fy)[..., None])


class VoxelNeighborAgg(nn.Module):
    """3x3x3 dense-voxel neighborhood aggregation around query points.

    The TPU stand-in for the reference's `NeighborVoxelSAModuleMSG`
    (voxel-hash query + stack SA, `voxel_pool_modules.py:8`): window rows are
    fetched from the dense volume with 9 wide `take_along_axis` calls
    (3 contiguous x-cells per row), offsets conditioned through the shared
    MLP, occupancy-masked max-pool.
    """
    mlp: Sequence[int]
    downsample: int
    voxel_size: Any
    pc_range: Any

    @nn.compact
    def __call__(self, volume, occupancy, keypoints, training: bool = False):
        """volume (B, D, H, W, C); occupancy (B, D, H, W) bool;
        keypoints (B, K, 3) -> (B, K, mlp[-1])."""
        B, D, H, W, C = volume.shape
        vx = self.voxel_size[0] * self.downsample
        vy = self.voxel_size[1] * self.downsample
        vz = self.voxel_size[2] * self.downsample
        kx = (keypoints[..., 0] - self.pc_range[0]) / vx
        ky = (keypoints[..., 1] - self.pc_range[1]) / vy
        kz = (keypoints[..., 2] - self.pc_range[2]) / vz
        ix = jnp.clip(kx.astype(jnp.int32), 1, max(W - 2, 0))
        iy = jnp.clip(ky.astype(jnp.int32), 0, H - 1)
        iz = jnp.clip(kz.astype(jnp.int32), 0, D - 1)

        vol = jnp.concatenate(
            [volume, occupancy[..., None].astype(volume.dtype)], axis=-1)
        Cp = C + 1
        # x-rolled wide rows: (B, D*H*W, 3*Cp), row c = cells (c-1, c, c+1)
        flat = vol.reshape(B, D * H * W, Cp)
        t3 = jnp.concatenate([
            jnp.pad(flat[:, :-1], ((0, 0), (1, 0), (0, 0))),
            flat,
            jnp.pad(flat[:, 1:], ((0, 0), (0, 1), (0, 0)))], axis=-1)

        rows = []
        in_bounds = []
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                zz, yy = iz + dz, iy + dy
                okr = (zz >= 0) & (zz < D) & (yy >= 0) & (yy < H)
                r = jnp.where(okr, (zz * H + yy) * W + ix, 0)
                rows.append(flat_gather(t3, r))
                in_bounds.append(okr)
        win = jnp.concatenate(rows, axis=-1).reshape(B, -1, 27, Cp)  # (B,K,27,Cp)
        okb = jnp.stack(in_bounds, axis=-1)          # (B, K, 27//3... per (dz,dy))
        okb = jnp.repeat(okb, 3, axis=-1)            # expand over the 3 x-cells
        feats = win[..., :C]
        occ = (win[..., C] > 0.5) & okb

        offs = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                    indexing='ij'), -1).reshape(27, 3)[:, ::-1]
        # relative offset of each neighbor cell center from the keypoint
        base = jnp.stack([ix, iy, iz], -1).astype(jnp.float32)
        frac = jnp.stack([kx, ky, kz], -1) - base                   # (B, K, 3)
        rel = (jnp.asarray(offs, jnp.float32)[None, None] + 0.5
               - frac[:, :, None, :])                               # (B,K,27,3)
        rel = rel * jnp.asarray([vx, vy, vz], jnp.float32)

        h = jnp.concatenate([rel, feats], axis=-1)
        for i, c in enumerate(self.mlp):
            h = nn.Dense(c, use_bias=False, name=f'fc{i}')(h)
            h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, name=f'bn{i}')(h)
            h = nn.relu(h)
        h = jnp.where(occ[..., None], h, -jnp.inf)
        out = jnp.max(h, axis=2)
        any_occ = jnp.any(occ, axis=2)
        return jnp.where(any_occ[..., None], out, 0.0)


class SparseVoxelNeighborAgg(nn.Module):
    """Sparse-slot-table variant of `VoxelNeighborAgg` — the reference's
    voxel-hash neighborhood query (`voxel_query_gpu.cu` +
    `voxel_pool_modules.py:8`) recast TPU-first: the stage's active set is
    scattered ONCE into a dense int32 slot-ID grid (stage grids are 8-512x
    smaller than the input grid, so this fits where dense features would
    not), and each query point's 3x3x3 neighborhood is two static-shape
    gathers — scalar slot ids from the ID grid, then feature rows from the
    slot table. MLP/max-pool semantics and param shapes are identical to
    the dense module (the parity test loads one's weights into the other).
    This is what lets Voxel R-CNN / PV-RCNN pool multi-scale features at
    the reference's native 0.05 m regime, where dense per-stage volumes
    cannot exist."""
    mlp: Sequence[int]
    downsample: int
    voxel_size: Any
    pc_range: Any
    dims: Any                    # (D, H, W) of this stage's sparse grid

    @nn.compact
    def __call__(self, feats, coords, mask, keypoints,
                 training: bool = False):
        """feats (B, V, C) slot table; coords (B, V, 3) int32 zyx; mask
        (B, V); keypoints (B, K, 3) -> (B, K, mlp[-1])."""
        B, V, C = feats.shape
        D, H, W = (int(v) for v in self.dims)
        vx = self.voxel_size[0] * self.downsample
        vy = self.voxel_size[1] * self.downsample
        vz = self.voxel_size[2] * self.downsample
        kx = (keypoints[..., 0] - self.pc_range[0]) / vx
        ky = (keypoints[..., 1] - self.pc_range[1]) / vy
        kz = (keypoints[..., 2] - self.pc_range[2]) / vz
        # identical base-cell clipping to the dense module (parity)
        ix = jnp.clip(kx.astype(jnp.int32), 1, max(W - 2, 0))
        iy = jnp.clip(ky.astype(jnp.int32), 0, H - 1)
        iz = jnp.clip(kz.astype(jnp.int32), 0, D - 1)

        # slot-ID grid: cell -> slot+1 (0 = empty); flat-batch scatter
        ncell = D * H * W
        co = coords.astype(jnp.int32)
        key = (co[..., 0] * H + co[..., 1]) * W + co[..., 2]
        key = jnp.where(mask, key, ncell)
        boff = (jnp.arange(B, dtype=key.dtype) * (ncell + 1))[:, None]
        ids = jnp.zeros((B * (ncell + 1),), jnp.int32).at[
            (key + boff).reshape(-1)].set(
            jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32) + 1,
                             (B, V)).reshape(-1))
        # pin the ID grid as its own fusion island — letting XLA fuse the
        # 24M-row scatter with the downstream gathers triggers the same
        # pathological XLA:TPU compile as the xwin ladder (BENCH_NOTES)
        ids = jax.lax.optimization_barrier(ids).reshape(B, ncell + 1, 1)

        offs = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                    indexing='ij'), -1).reshape(27, 3)
        zz = iz[..., None] + offs[None, None, :, 0]        # (B, K, 27)
        yy = iy[..., None] + offs[None, None, :, 1]
        xx = ix[..., None] + offs[None, None, :, 2]
        okb = ((zz >= 0) & (zz < D) & (yy >= 0) & (yy < H)
               & (xx >= 0) & (xx < W))
        q = jnp.where(okb, (zz * H + yy) * W + xx, ncell)
        K = keypoints.shape[1]
        slot1 = flat_gather(ids, q.reshape(B, K * 27))[..., 0]
        slot1 = slot1.reshape(B, K, 27)
        hit = (slot1 > 0) & okb
        table = jnp.concatenate(
            [feats, jnp.zeros((B, 1, C), feats.dtype)], axis=1)
        rows = flat_gather(table, jnp.where(hit, slot1 - 1, V)
                           .reshape(B, K * 27))
        rows = rows.reshape(B, K, 27, C).astype(jnp.float32)

        # relative offset of each neighbor cell center from the keypoint
        # (identical formula to VoxelNeighborAgg; offs is zyx -> flip)
        base = jnp.stack([ix, iy, iz], -1).astype(jnp.float32)
        frac = jnp.stack([kx, ky, kz], -1) - base
        rel = (jnp.asarray(offs[:, ::-1], jnp.float32)[None, None] + 0.5
               - frac[:, :, None, :])
        rel = rel * jnp.asarray([vx, vy, vz], jnp.float32)

        h = jnp.concatenate([rel, rows], axis=-1)
        for i, c in enumerate(self.mlp):
            h = nn.Dense(c, use_bias=False, name=f'fc{i}')(h)
            h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, name=f'bn{i}')(h)
            h = nn.relu(h)
        h = jnp.where(hit[..., None], h, -jnp.inf)
        out = jnp.max(h, axis=2)
        any_occ = jnp.any(hit, axis=2)
        return jax.lax.optimization_barrier(
            jnp.where(any_occ[..., None], out, 0.0))


def sparse_stage_dims(point_cloud_range, voxel_size, stride):
    """(D, H, W) of a sparse-ladder stage grid given its downsample stride
    (1/2/4/8 -> ladder stages 1-4), matching `ops/sparse_maps.ladder_shapes`
    (input z extent +1, reference `sparse_shape = grid_size[::-1]+[1,0,0]`)."""
    from ...ops.sparse_maps import ladder_shapes
    import numpy as _np
    pr = _np.asarray(point_cloud_range, _np.float64)
    grid = _np.round((pr[3:6] - pr[0:3]) / _np.asarray(voxel_size)
                     ).astype(int)
    return ladder_shapes(grid)[{1: 0, 2: 1, 4: 2, 8: 3}[int(stride)]]


class VoxelSetAbstraction(nn.Module):
    model_cfg: Any
    voxel_size: Any
    point_cloud_range: Any
    num_bev_features: int = 0
    num_rawpoint_features: int = 4

    @property
    def num_point_features(self):
        return as_cfg(self.model_cfg).NUM_OUTPUT_FEATURES

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        points = batch['points']                       # (B, N, 3+C)
        xyz = points[..., :3]
        n_key = int(cfg.NUM_KEYPOINTS)

        if cfg.get('SAMPLE_METHOD', 'FPS') == 'SPC' and 'rois' in batch:
            # sectorized-proposal-centric sampling (PV-RCNN++,
            # `voxel_set_abstraction.py:sectorized_proposal_centric_sampling`):
            # restrict to points near the stage-1 proposals, then SECTOR-FPS
            # — azimuth-partitioned FPS with per-sector budgets proportional
            # to sector population (`sector_fps:78-121`), fixed-shape via
            # the FPS-prefix recast in `ops/pointnet2.sector_fps`.
            from ...ops.pointnet2 import sector_fps
            rois = batch['rois'][..., :3]              # (B, R, 3)
            spc = cfg.SPC_SAMPLING
            rad = float(spc.SAMPLE_RADIUS_WITH_ROI)
            d2 = jnp.min(jnp.sum(
                (xyz[:, :, None, :2] - rois[:, None, :, :2]) ** 2, -1), -1)
            roi_ok = jnp.any(batch.get(
                'roi_mask', jnp.ones(rois.shape[:2], bool)), -1, keepdims=True)
            near = (d2 < rad * rad) | ~roi_ok          # all pts if no rois
            fps_idx = sector_fps(xyz, near, n_key,
                                 int(spc.get('NUM_SECTORS', 6)),
                                 per_sector_cap=min(n_key, xyz.shape[1]))
        else:
            fps_idx = dispatch.farthest_point_sample(xyz, n_key)
        keypoints = dispatch.gather_operation(xyz, fps_idx)       # (B, K, 3)

        pr = self.point_cloud_range
        bev_range = (pr[0], pr[1], pr[3], pr[4])
        sources = []
        sa_cfg = cfg.SA_LAYER

        if 'bev' in cfg.FEATURES_SOURCE:
            sources.append(bilinear_from_bev(
                batch['spatial_features'], keypoints, pr, self.voxel_size,
                batch.get('spatial_features_stride', 8)))

        if 'raw_points' in cfg.FEATURES_SOURCE:
            rp = sa_cfg.raw_points
            raw_feats = points[..., 3:] if points.shape[-1] > 3 else None
            if rp.get('AGGREGATION', '') == 'VectorPoolAgg':
                sources.append(VectorPoolAgg(
                    radius=float(rp.POOL_RADIUS[0]),
                    nsample=int(rp.NSAMPLE[0]),
                    local_grid=int(rp.get('LOCAL_GRID', 3)),
                    mlp=[int(c) for c in rp.MLPS[0]],
                    pc_range=bev_range, name='vp_raw')(
                        xyz, raw_feats, keypoints, training=training))
            else:
                mlps = [list(m) for m in rp.MLPS]
                sources.append(SAGroupMLP(
                    radii=list(rp.POOL_RADIUS), nsamples=list(rp.NSAMPLE),
                    mlps=mlps, pc_range=bev_range, name='sa_raw')(
                        xyz, raw_feats, keypoints, training=training))

        for src in cfg.FEATURES_SOURCE:
            if not src.startswith('x_conv'):
                continue
            scfg = sa_cfg[src]
            mlps = [list(m) for m in scfg.MLPS]
            mlp = mlps[0] if isinstance(mlps[0], list) else mlps
            if 'multi_scale_3d_features' in batch:
                vol, occ, stride = batch['multi_scale_3d_features'][src]
                sources.append(VoxelNeighborAgg(
                    mlp=mlp, downsample=int(scfg.DOWNSAMPLE_FACTOR),
                    voxel_size=self.voxel_size, pc_range=pr,
                    name=f'agg_{src}')(vol, occ, keypoints,
                                       training=training))
            else:
                # sparse-ladder multi-scale sources (native 0.05 m regime)
                f, co, mk, stride = \
                    batch['multi_scale_3d_features_sparse'][src]
                sources.append(SparseVoxelNeighborAgg(
                    mlp=mlp, downsample=int(scfg.DOWNSAMPLE_FACTOR),
                    voxel_size=self.voxel_size, pc_range=pr,
                    dims=sparse_stage_dims(pr, self.voxel_size, stride),
                    name=f'agg_{src}')(f, co, mk, keypoints,
                                       training=training))

        fused = jnp.concatenate(sources, axis=-1)
        batch['point_features_before_fusion'] = fused
        h = nn.Dense(cfg.NUM_OUTPUT_FEATURES, use_bias=False, name='fusion')(fused)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name='fusion_bn')(h)
        batch['point_features'] = nn.relu(h)
        batch['point_coords'] = keypoints
        return batch


class VectorPoolAgg(nn.Module):
    """VectorPool aggregation (PV-RCNN++) — dense TPU recast.

    The reference `VectorPoolAggregationModuleMSG`
    (`pointnet2_stack/pointnet2_modules.py:30-458` + `vector_pool_gpu.cu`)
    gives each keypoint a small local voxel grid whose subvoxels carry
    SEPARATE output channels (position-dependent encoding, unlike max-pool
    SA). Here: the fused grid query supplies K in-radius neighbors per
    keypoint, each neighbor lands in its local subvoxel by relative offset,
    subvoxels average their neighbors (one-hot matmul), and the concatenated
    per-subvoxel features pass through an MLP.
    """
    radius: float
    nsample: int
    local_grid: int           # G: G^3 subvoxels
    mlp: Sequence[int]
    pc_range: Any

    @nn.compact
    def __call__(self, xyz, features, keypoints, training: bool = False):
        from ...ops import sa_fused
        B, M, _ = keypoints.shape
        G = int(self.local_grid)
        G3 = G ** 3
        (rel, gfeat, hit), = sa_fused.fused_query_group(
            [float(self.radius)], [int(self.nsample)], xyz, features,
            keypoints, tuple(self.pc_range), cap=32)
        C = 0 if gfeat is None else gfeat.shape[-1]
        parts = [rel] if gfeat is None else [rel, gfeat]
        neigh = jnp.concatenate(parts, axis=-1)            # (B, M, K, 3+C)
        # subvoxel id from the relative offset
        cell = jnp.clip(((rel / (2 * self.radius) + 0.5) * G).astype(jnp.int32),
                        0, G - 1)
        cid = (cell[..., 0] * G + cell[..., 1]) * G + cell[..., 2]
        nonzero = jnp.any(jnp.abs(rel) > 1e-6, axis=-1) | hit[..., None]
        oh = ((cid[..., None] == jnp.arange(G3)) & nonzero[..., None]
              ).astype(jnp.bfloat16)                       # (B, M, K, G3)
        dn = (((2,), (2,)), ((0, 1), (0, 1)))
        sums = jax.lax.dot_general(
            jnp.moveaxis(neigh, 3, 2).astype(jnp.bfloat16), oh,
            (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)            # (B, M, 3+C, G3)
        cnt = jnp.sum(oh.astype(jnp.float32), axis=2)      # (B, M, G3)
        avg = sums / jnp.clip(cnt[:, :, None, :], 1.0)
        avg = jnp.where(cnt[:, :, None, :] > 0, avg, 0.0)
        flat = jnp.moveaxis(avg, 2, 3).reshape(B, M, G3 * (3 + C))
        h = flat
        for i, c in enumerate(self.mlp):
            h = nn.Dense(c, use_bias=False, name=f'fc{i}')(h)
            h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, name=f'bn{i}')(h)
            h = nn.relu(h)
        return jnp.where(hit[..., None], h, 0.0)
