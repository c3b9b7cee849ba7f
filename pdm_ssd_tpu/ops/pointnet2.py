"""Fixed-shape, mask-padded point-set ops in pure JAX.

TPU-native equivalents of the reference CUDA ops
(`pcdet/ops/pointnet2/pointnet2_batch/src/*.cu`), with identical semantics:

- `farthest_point_sample`: iterative max-min FPS starting from index 0
  (`sampling_gpu.cu:100-260`).
- `ball_query`: per-center first-`nsample` neighbors within radius, in point order,
  with first-hit backfill for underfull balls and all-zeros for empty balls
  (`ball_query_gpu.cu:15-51`).
- `three_nn` / `three_interpolate`: 3 nearest neighbors returning *squared*
  distances, inverse-distance-weighted interpolation (`interpolate_gpu.cu:16-168`).

Everything is statically shaped and jittable; raggedness is expressed with an
optional boolean validity `mask` (padded points are never sampled / grouped).
These functions are the correctness oracles for the Pallas kernels in
`pdm_ssd_tpu/ops/pallas/`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e10


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample(xyz: jax.Array, npoint: int, mask: jax.Array | None = None) -> jax.Array:
    """Iterative farthest point sampling.

    Args:
        xyz: (B, N, 3) point coordinates.
        npoint: number of samples M.
        mask: optional (B, N) bool; False entries are never selected (unless a row
            has fewer than `npoint` valid points, in which case selection falls back
            to already-visited points, mirroring duplicate-index behavior of the
            reference when N < npoint).
    Returns:
        (B, M) int32 indices into N. First index is always 0 (reference seeds at 0).
    """
    B, N, _ = xyz.shape
    x = xyz.astype(jnp.float32)

    def step(carry, _):
        dists, last = carry  # dists: (B, N) min sq-dist to chosen set; last: (B,)
        last_xyz = jnp.take_along_axis(x, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((x - last_xyz) ** 2, axis=-1)  # (B, N)
        dists = jnp.minimum(dists, d)
        cand = dists if mask is None else jnp.where(mask, dists, -1.0)
        nxt = jnp.argmax(cand, axis=-1).astype(jnp.int32)
        return (dists, nxt), nxt

    first = jnp.zeros((B,), jnp.int32) if mask is None else \
        jnp.argmax(mask, axis=-1).astype(jnp.int32)   # seed at first valid
    init = (jnp.full((B, N), BIG, jnp.float32), first)
    if npoint == 1:
        return first[:, None]
    (_, _), rest = jax.lax.scan(step, init, None, length=npoint - 1)
    return jnp.concatenate([first[:, None], rest.T], axis=1)


def flat_gather(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched row gather with the batch FLATTENED into the row dim:
    features (B, N, C), idx (B, ...) -> (B, ..., C).

    XLA:TPU lowers a gather with batch dims ~2.7x slower than the same
    gather over a flat (B*N, C) table (8.8 vs 3.3 ns/row, round-3
    measurement, tools/microbench_sparse_gather*.py) — every batched row
    gather in the repo routes through here."""
    B, N, C = features.shape
    ishape = idx.shape
    boff = jnp.arange(B, dtype=jnp.int32) * N
    flat = (idx.astype(jnp.int32).reshape(B, -1)
            + boff[:, None]).reshape(-1)
    return features.reshape(B * N, C)[flat].reshape(*ishape, C)


def gather_operation(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather features at indices. features: (B, N, C), idx: (B, M) -> (B, M, C).

    (Reference `gather_points_kernel_fast`, `sampling_gpu.cu:15-90`, transposed to
    channels-last which is the TPU-friendly layout.)
    """
    return flat_gather(features, idx)


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array,
               mask: jax.Array | None = None) -> jax.Array:
    """Ball query with reference semantics (`ball_query_gpu.cu:15-51`).

    For each center, returns the indices of the first `nsample` points (in point
    order) whose squared distance < radius^2. Underfull balls repeat the first
    found index; empty balls return all zeros.

    Args:
        radius: ball radius.
        nsample: samples per ball K.
        xyz: (B, N, 3) support points.
        new_xyz: (B, M, 3) ball centers.
        mask: optional (B, N) validity of support points.
    Returns:
        idx: (B, M, K) int32.
    """
    B, N, _ = xyz.shape
    d2 = jnp.sum((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)  # (B,M,N)
    within = d2 < (radius * radius)
    if mask is not None:
        within = within & mask[:, None, :]
    # Key: points within radius keep their original order and sort before all
    # out-of-radius points -> top_k of negative key gives first hits in order.
    ar = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(within, ar, N + ar)  # (B,M,N); smaller = earlier valid
    neg_key, take_idx = jax.lax.top_k(-key, nsample)  # ascending key
    hit = (-neg_key) < N  # (B,M,K) slots that found a real neighbor
    first = take_idx[..., :1]
    any_hit = hit[..., :1]
    idx = jnp.where(hit, take_idx, jnp.where(any_hit, first, 0))
    return idx.astype(jnp.int32)


def grouping_operation(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Group features by neighbor indices. features: (B, N, C), idx: (B, M, K)
    -> (B, M, K, C). (Reference `group_points_kernel_fast`, `group_points_gpu.cu:14-92`.)"""
    return flat_gather(features, idx)


def query_and_group(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array,
                    features: jax.Array | None, use_xyz: bool = True,
                    mask: jax.Array | None = None) -> jax.Array:
    """QueryAndGroup (`pointnet2_utils.py:10-291` reference wrapper): ball query,
    gather neighbor xyz relative to center, concat neighbor features.

    Returns: (B, M, K, 3 + C) if use_xyz and features given, channels-last.
    """
    idx = ball_query(radius, nsample, xyz, new_xyz, mask=mask)
    grouped_xyz = grouping_operation(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feats = grouping_operation(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        return grouped_feats
    assert use_xyz, "Cannot have not features and not use xyz as a feature!"
    return grouped_xyz


@jax.jit
def three_nn(unknown: jax.Array, known: jax.Array,
             known_mask: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """3 nearest known neighbors for each unknown point.

    Returns (dist2, idx): SQUARED distances (B, N, 3) and indices (B, N, 3),
    matching the reference CUDA kernel (`interpolate_gpu.cu:16-58`, best1/2/3
    are squared). NOTE: the reference's Python wrapper then returns
    sqrt(dist2) (`pointnet2_utils.py:99` `return torch.sqrt(dist2), idx`) —
    consumers that mirror the FP module's inverse-distance weights must use
    `three_interpolate_weights` (which takes sqrt internally), not 1/d2.
    """
    d2 = jnp.sum((unknown[:, :, None, :] - known[:, None, :, :]) ** 2, axis=-1)  # (B,N,M)
    if known_mask is not None:
        d2 = jnp.where(known_mask[:, None, :], d2, BIG)
    neg_d2, idx = jax.lax.top_k(-d2, 3)
    return -neg_d2, idx.astype(jnp.int32)


def three_interpolate(features: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted interpolation of features. features: (B, M, C), idx/weight: (B, N, 3)
    -> (B, N, C). (Reference `three_interpolate_kernel_fast`, `interpolate_gpu.cu:70-168`.)"""
    gathered = grouping_operation(features, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def three_interpolate_weights(dist2: jax.Array) -> jax.Array:
    """Inverse-distance weights exactly as the FP module computes them:
    the reference's ThreeNN wrapper returns L2 (NOT squared) distances
    (`pointnet2_utils.py:99`), and the FP module weights are
    w = (1/(dist+1e-8)) / sum (`pointnet2_modules.py:152-156`). Takes the
    kernel-level squared distances and applies the sqrt here. (Round-3 fix —
    caught by the torch-oracle backbone parity test; the previous revision
    weighted by 1/d2, a documented-wrong reading of the reference.)"""
    dist_recip = 1.0 / (jnp.sqrt(dist2) + 1e-8)
    norm = jnp.sum(dist_recip, axis=-1, keepdims=True)
    return dist_recip / norm


def sector_fps(xyz: jax.Array, valid: jax.Array, npoint: int,
               num_sectors: int, per_sector_cap: int | None = None) -> jax.Array:
    """Fixed-shape sector-FPS (PV-RCNN++ SPC keypoints,
    `pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py:78-121`).

    The reference partitions points into azimuth sectors and FPS-samples each
    with budget ceil(cnt_s / N * npoint). Dynamic budgets break XLA, so this
    recast exploits the FPS *prefix property* (greedy maximin selections
    nest): run a fixed-cap masked FPS per sector, then keep the globally
    smallest "sector consumption fractions" (i + 1) / cnt_s — exactly the
    proportional allocation up to the reference's ceil rounding.

    xyz (B, N, 3), valid (B, N) -> (B, npoint) indices into N.
    """
    B, N, _ = xyz.shape
    S = num_sectors
    cap = per_sector_cap or npoint
    ang = jnp.arctan2(xyz[..., 1], xyz[..., 0]) + jnp.pi
    sec = jnp.clip(jnp.floor(ang / (2 * jnp.pi / S)), 0, S - 1).astype(jnp.int32)
    idx_all, prio_all = [], []
    for s in range(S):
        m = valid & (sec == s)
        cnt = jnp.sum(m, axis=-1)                           # (B,)
        idx_s = farthest_point_sample(xyz, cap, mask=m)     # (B, cap)
        # drop selections beyond the sector population (mask exhausted ->
        # duplicates) and empty sectors
        rank = jnp.arange(cap)[None, :]
        ok = (rank < cnt[:, None]) & (cnt[:, None] > 0)
        prio = jnp.where(ok, (rank + 1.0) / jnp.maximum(cnt[:, None], 1), 1e9)
        idx_all.append(idx_s)
        prio_all.append(prio)
    idx_cat = jnp.concatenate(idx_all, axis=1)              # (B, S*cap)
    prio_cat = jnp.concatenate(prio_all, axis=1)
    _, sel = jax.lax.top_k(-prio_cat, npoint)
    return jnp.take_along_axis(idx_cat, sel, axis=1)
