"""Shared synthetic-cloud voxel coords for sparse-ladder microbenches."""
import numpy as np


def make_coords(B, cap, seed=0):
    """(B, cap, 3) zyx sorted coords + (B, cap) mask at the 0.05 m KITTI
    grid, lidar-like density (ground plane + boxes)."""
    from bench_second_sparse import synth_cloud
    rng = np.random.RandomState(seed)
    coords = np.zeros((B, cap, 3), np.int32)
    mask = np.zeros((B, cap), bool)
    for b in range(B):
        pts = synth_cloud(rng)
        vx = np.floor((pts[:, 0] - 0.0) / 0.05).astype(np.int64)
        vy = np.floor((pts[:, 1] + 40.0) / 0.05).astype(np.int64)
        vz = np.floor((pts[:, 2] + 3.0) / 0.1).astype(np.int64)
        ok = (vx >= 0) & (vx < 1408) & (vy >= 0) & (vy < 1600) \
            & (vz >= 0) & (vz < 40)
        key = (vz[ok] * 1600 + vy[ok]) * 1408 + vx[ok]
        u = np.unique(key)[:cap]
        n = len(u)
        coords[b, :n, 0] = u // (1600 * 1408)
        coords[b, :n, 1] = (u // 1408) % 1600
        coords[b, :n, 2] = u % 1408
        mask[b, :n] = True
    return coords, mask
