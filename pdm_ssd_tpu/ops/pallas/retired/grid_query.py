"""Fused bucketed ball query as a Pallas TPU kernel (indexed DMA).

The XLA formulation of the grid-hash ball query (`ops/neighbor_grid.py`) is
bound by gathers: reading each center's 9 neighbor buckets costs either
~80ns/element (XLA serial gather) or N_cells-proportional FLOPs (one-hot
matmul). This kernel exploits the bucket layout instead:

- each cell is packed as exactly ONE 128-lane table row: 32 slots x 4 channels
  channel-major — [x*32 | y*32 | z*32 | idx*32] — so a 3x3 cell neighborhood
  is 3 DMA-aligned (3, 128) slices of the HBM-resident table (cells
  (y+dy, x-1..x+1) are consecutive);
- candidate coordinates ride in the same DMA (no second gather);
- the in-ball K-selection runs on the VPU per center (modular-rank masked
  max; the prefix-sum is a tiny lower-triangular MXU matmul since `cumsum`
  has no Pallas lowering);
- out-of-range row-triples are clamped; contaminated candidates land ~W cells
  away in y and are killed by the radius test; padded slots carry idx >= N.

Replaces `ball_query_gpu.cu:15-51` for the point-exact model path at
production scale, where the one-hot kernel's FLOP blowup (proportional to
n_cells) and VMEM table residency both break down.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 32  # slots per cell: 32 x 4 channels == one 128-lane row


def _query_kernel(cells_ref, centers_ref, table_hbm, out_ref, cand_scratch,
                  sems, *, w: int, n_rows: int, nsample: int,
                  block_m: int, radius2: float, n_points: int, m_total: int):
    """cells_ref: full (B, M) int32 SMEM; centers_ref: full (B, 3*M) f32 SMEM
    laid out [x0..xM | y0..yM | z0..zM]; table_hbm: (B, n_rows, 128) ANY;
    out_ref: (1, BM, K) int32; cand_scratch: (2, 9, 128) VMEM double-buffered;
    sems: DMA (2, 3)."""
    b = pl.program_id(0)
    m0 = pl.program_id(1) * block_m

    def dma(m, slot, t):
        cell = cells_ref[b, m0 + m]
        start = jnp.clip(cell + (t - 1) * w - 1, 0, n_rows - 3)
        return pltpu.make_async_copy(
            table_hbm.at[b, pl.ds(start, 3), :],
            cand_scratch.at[slot, pl.ds(t * 3, 3), :],
            sems.at[slot, t],
        )

    for t in range(3):
        dma(0, 0, t).start()

    def body(m, _):
        slot = m % 2

        @pl.when(m + 1 < block_m)
        def _():
            for t in range(3):
                dma(m + 1, (m + 1) % 2, t).start()

        for t in range(3):
            dma(m, slot, t).wait()

        cand = cand_scratch[slot]                    # (9, 128) packed
        xs = cand[:, 0:CAP]
        ys = cand[:, CAP:2 * CAP]
        zs = cand[:, 2 * CAP:3 * CAP]
        ids = cand[:, 3 * CAP:4 * CAP]               # (9, 32)
        cx = centers_ref[b, m0 + m]
        cy = centers_ref[b, m_total + m0 + m]
        cz = centers_ref[b, 2 * m_total + m0 + m]
        d2 = (xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2
        within = (d2 < radius2) & (ids < float(n_points))  # (9, 32)

        # global rank over (cell, slot) in row-major order:
        # in-row rank via (32,32) lower-tri matmul on lanes, row offsets via
        # (9,9) strictly-lower-tri matmul on sublanes.
        wf = within.astype(jnp.float32)
        l32r = jax.lax.broadcasted_iota(jnp.int32, (CAP, CAP), 0)
        l32c = jax.lax.broadcasted_iota(jnp.int32, (CAP, CAP), 1)
        triT = (l32c >= l32r).astype(jnp.float32)    # (32, 32): inclusive, lanes
        rank_in_row = jnp.dot(wf, triT, preferred_element_type=jnp.float32)
        r9r = jax.lax.broadcasted_iota(jnp.int32, (9, 9), 0)
        r9c = jax.lax.broadcasted_iota(jnp.int32, (9, 9), 1)
        stri = (r9r > r9c).astype(jnp.float32)       # strictly lower, sublanes
        row_sums = jnp.sum(wf, axis=1, keepdims=True)            # (9, 1)
        row_off = jnp.dot(stri, row_sums, preferred_element_type=jnp.float32)
        rank = (rank_in_row + row_off - 1.0).astype(jnp.int32)   # (9, 32)

        mod = rank % nsample
        cols = []
        for k in range(nsample):
            mk = within & (mod == k)
            cols.append(jnp.max(jnp.where(mk, ids, -1.0), axis=(0, 1),
                                keepdims=True))            # (1, 1)
        sel = jnp.concatenate(cols, axis=1)                 # (1, K)
        # backfill: empty slots repeat the first hit; zero hits -> 0
        first_val = jnp.max(jnp.where((rank == 0) & within, ids, -1.0),
                            axis=(0, 1), keepdims=True)     # (1, 1)
        sel = jnp.where(sel >= 0, sel, jnp.where(first_val >= 0, first_val, 0.0))
        out_ref[0, pl.ds(m, 1), :] = sel.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, block_m, body, 0)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def grid_ball_query_pallas(radius: float, nsample: int, xyz: jax.Array,
                           new_xyz: jax.Array,
                           pc_range=(-80.0, -80.0, 80.0, 80.0)) -> jax.Array:
    """Drop-in for `neighbor_grid.grid_ball_query` (any-K-in-ball semantics,
    first-hit backfill, 0 for empty). xyz: (B, N, 3), new_xyz: (B, M, 3)
    -> (B, M, K) int32."""
    from ...neighbor_grid import build_bucket_table_packed

    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    cs = max(float(radius), 0.4)  # 3x3 neighborhood covers r <= cell size
    W = int((pc_range[2] - pc_range[0]) / cs) + 2
    H = int((pc_range[3] - pc_range[1]) / cs) + 2
    table = build_bucket_table_packed(xyz, cs, (W, H), pc_min=pc_range[:2])
    n_rows = table.shape[1]

    cx = jnp.clip(jnp.floor((new_xyz[..., 0] - pc_range[0]) / cs).astype(jnp.int32), 1, W - 2)
    cy = jnp.clip(jnp.floor((new_xyz[..., 1] - pc_range[1]) / cs).astype(jnp.int32), 1, H - 2)
    cells = cy * W + cx                                       # (B, M)
    centers_flat = jnp.transpose(new_xyz, (0, 2, 1)).reshape(B, 3 * M)

    BM = min(M, 256)
    assert M % BM == 0, (M, BM)
    out = pl.pallas_call(
        functools.partial(_query_kernel, w=W, n_rows=n_rows, nsample=nsample,
                          block_m=BM, radius2=float(radius) ** 2, n_points=N,
                          m_total=M),
        grid=(B, M // BM),
        out_shape=jax.ShapeDtypeStruct((B, M, nsample), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # (B, M) cell ids
            pl.BlockSpec(memory_space=pltpu.SMEM),            # (B, 3M) centers
            pl.BlockSpec(memory_space=pl.ANY),             # packed table
        ],
        out_specs=pl.BlockSpec((1, BM, nsample), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )(cells, centers_flat, table)
    return out


def _group_kernel(cells_ref, centers_ref, table_hbm, out_ref, cand_scratch,
                  sems, *, w: int, n_cell_rows: int, nsample: int,
                  block_m: int, radius2: float, n_points: int, m_total: int):
    """Fused query + feature grouping. cells/centers as in `_query_kernel`;
    table_hbm: (B, (n_cells+1)*32, 128) slot-major rows; out_ref:
    (1, BM*K, 128) selected candidate rows [x, y, z, idx, feats...];
    cand_scratch: (2, 288, 128)."""
    b = pl.program_id(0)
    m0 = pl.program_id(1) * block_m
    nc = 9 * CAP  # 288 candidate rows

    def dma(m, slot, t):
        cell = cells_ref[b, m0 + m]
        start = jnp.clip((cell + (t - 1) * w - 1) * CAP, 0, n_cell_rows - 3 * CAP)
        return pltpu.make_async_copy(
            table_hbm.at[b, pl.ds(start, 3 * CAP), :],
            cand_scratch.at[slot, pl.ds(t * 3 * CAP, 3 * CAP), :],
            sems.at[slot, t],
        )

    for t in range(3):
        dma(0, 0, t).start()

    def body(m, _):
        slot = m % 2

        @pl.when(m + 1 < block_m)
        def _():
            for t in range(3):
                dma(m + 1, (m + 1) % 2, t).start()

        for t in range(3):
            dma(m, slot, t).wait()

        cand = cand_scratch[slot]                     # (288, 128)
        cx = centers_ref[b, m0 + m]
        cy = centers_ref[b, m_total + m0 + m]
        cz = centers_ref[b, 2 * m_total + m0 + m]
        d2 = ((cand[:, 0:1] - cx) ** 2 + (cand[:, 1:2] - cy) ** 2
              + (cand[:, 2:3] - cz) ** 2)             # (288, 1)
        within = (d2 < radius2) & (cand[:, 3:4] < float(n_points))

        wf = within.astype(jnp.float32)               # (288, 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 1)
        tri = (rows >= cols).astype(jnp.float32)
        rank = jnp.dot(tri, wf, preferred_element_type=jnp.float32
                       ).astype(jnp.int32) - 1        # (288, 1)
        # slot winners for all K at once: (K, nc) masks -> per-slot winner lid
        # -> one-hot (K, nc) -> single MXU matmul against the candidate rows.
        # (Per-row dynamic sublane copies cost ~2.7us each in Mosaic; the
        # one-hot contraction replaces 32 of them with one 1.2M-MAC matmul.)
        mod = rank % nsample                           # (nc, 1)
        lids = jax.lax.broadcasted_iota(jnp.int32, (nc, 1), 0)
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (1, nsample), 1)
        mk = (mod == k_ids) & within                   # (nc, K)
        lid_k = jnp.max(jnp.where(mk, lids, -1), axis=0, keepdims=True)  # (1, K)
        first_lid = jnp.max(jnp.where((rank == 0) & within, lids, -1),
                            axis=0, keepdims=True)     # (1, 1)
        lid_k = jnp.where(lid_k >= 0, lid_k, first_lid)  # -1 when no hits
        onehot = (lids == lid_k).astype(jnp.float32)   # (nc, K); all-0 if -1
        # hi/lo split matmul: the MXU rounds f32 operands through bf16, which
        # would quantize the copied coordinates/features (same trick as
        # onehot_gather._split_dot)
        hi = cand.astype(jnp.bfloat16).astype(jnp.float32)
        lo = cand - hi
        dn = (((0,), (0,)), ((), ()))
        rows = (jax.lax.dot_general(onehot, hi, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(onehot, lo, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32))
        # empty groups: zero rows would carry idx==0 (a real point); mark the
        # idx channel with N so consumers can mask them out
        no_hit = (first_lid < 0).astype(jnp.float32)   # (1, 1)
        idx_lane = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == 3)
        rows = rows + no_hit * idx_lane.astype(jnp.float32) * float(n_points)
        base = pl.multiple_of(m * nsample, nsample)
        out_ref[0, pl.ds(base, nsample), :] = rows
        return 0

    jax.lax.fori_loop(0, block_m, body, 0)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def grid_query_group_pallas(radius: float, nsample: int, xyz: jax.Array,
                            features: jax.Array | None,
                            pc_range=(-80.0, -80.0, 80.0, 80.0),
                            new_xyz: jax.Array = None) -> jax.Array:
    """Fused ball query + neighbor grouping, zero gathers.

    STATUS: exact (parity-tested: all selections in-ball, features bit-matched
    via the hi/lo split dot, neighbor counts == the reference semantics) but
    not yet fast — Mosaic lowers the per-center sublane-contraction dots
    slowly (~60us/center); the round-2 optimization is batching multiple
    centers per selection matmul. The index-only `grid_ball_query_pallas`
    above is the production path meanwhile.

    xyz: (B, N, 3); features: (B, N, C<=124) or None; new_xyz: (B, M, 3).
    Returns (B, M, K, 128) rows [x, y, z, idx, feats..., pad]; empty groups are
    zero rows with idx channel 0 (callers use the idx channel < N as validity
    if needed — the downstream max-pool treats zero rows harmlessly after the
    relative-offset subtraction is masked).
    """
    from ...neighbor_grid import build_feature_table

    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    cs = max(float(radius), 0.4)
    W = int((pc_range[2] - pc_range[0]) / cs) + 2
    H = int((pc_range[3] - pc_range[1]) / cs) + 2
    table = build_feature_table(xyz, features, cs, (W, H), pc_min=pc_range[:2])
    n_cell_rows = table.shape[1]

    cx = jnp.clip(jnp.floor((new_xyz[..., 0] - pc_range[0]) / cs).astype(jnp.int32), 1, W - 2)
    cy = jnp.clip(jnp.floor((new_xyz[..., 1] - pc_range[1]) / cs).astype(jnp.int32), 1, H - 2)
    cells = cy * W + cx
    centers_flat = jnp.transpose(new_xyz, (0, 2, 1)).reshape(B, 3 * M)

    BM = min(M, 128)
    assert M % BM == 0, (M, BM)
    out = pl.pallas_call(
        functools.partial(_group_kernel, w=W, n_cell_rows=n_cell_rows,
                          nsample=nsample, block_m=BM,
                          radius2=float(radius) ** 2, n_points=N, m_total=M),
        grid=(B, M // BM),
        out_shape=jax.ShapeDtypeStruct((B, M * nsample, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, BM * nsample, 128), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9 * CAP, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )(cells, centers_flat, table)
    return out.reshape(B, M, nsample, 128)
