"""Row gather / scatter-add as fused one-hot matmuls on the MXU.

XLA's TPU gather/scatter lowers to ~75ns/element serial loops — catastrophic
for point-cloud workloads (grouping alone needs ~10M gathered elements per
step). The TPU-native formulation: a gather `out[r] = src[idx[r]]` is the
matmul `OneHot(idx) @ src`, and a scatter-add is `OneHot(idx)^T @ vals`.
This kernel builds the one-hot tiles on the fly in VMEM (never materialized
to HBM) and contracts them on the MXU at matmul speed.

Replaces (as the device-side implementation behind `ops.dispatch`):
- `group_points_kernel_fast` (`group_points_gpu.cu:14-92`),
- `gather_points_kernel_fast` (`sampling_gpu.cu:15-90`),
- the interpolation gathers (`interpolate_gpu.cu`),
- and the PDM neck's grid scatter (no CUDA counterpart).

Cost model: R gathered rows from a (N, C) table = 2*R*N*C MXU flops — for the
SA pyramid's shapes (R~50..200k, N~1k..16k, C~4..256) this is 10-300 GFLOP,
i.e. single-digit milliseconds, vs. seconds for the serial gather.

Batch is a leading grid dimension (NOT vmap — vmap over pallas_call batches
the whole VMEM working set and blows the 16MB scoped-vmem limit).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _split_dot(oh, chunk):
    """bf16 hi/lo-split matmul: exact to ~2^-16 relative (the one-hot lhs is
    exact; the rhs f32 is split into two bf16 parts). Keeps geometry and
    integer payloads accurate while staying on the bf16 MXU path."""
    hi = chunk.astype(jnp.bfloat16)
    lo = (chunk - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(oh, hi, preferred_element_type=jnp.float32)
            + jnp.dot(oh, lo, preferred_element_type=jnp.float32))


def _gather_kernel(idx_ref, src_ref, out_ref, *, n_chunk: int, n: int):
    # idx_ref: (1, 1, BR) int32; src_ref: (1, N, C); out_ref: (1, BR, C)
    br = out_ref.shape[1]
    idx = idx_ref[0, 0, :]                   # (BR,)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    n_steps = n // n_chunk

    def body(s, acc):
        n0 = s * n_chunk
        rows = jax.lax.broadcasted_iota(jnp.int32, (br, n_chunk), 1) + n0
        oh = (rows == idx[:, None]).astype(jnp.bfloat16)       # (BR, CN)
        chunk = src_ref[0, pl.ds(n0, n_chunk), :].astype(jnp.float32)
        return acc + _split_dot(oh, chunk)

    acc = jax.lax.fori_loop(0, n_steps, body, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _gather_rows_batched(src: jax.Array, idx: jax.Array, block_r: int = 512,
                         n_chunk: int = 2048) -> jax.Array:
    """src: (B, N, C) (row N-1 must be the designated invalid/zero row),
    idx: (B, R) -> (B, R, C)."""
    B, N, C = src.shape
    R = idx.shape[1]
    n_chunk = min(n_chunk, _round_up(N, 256))
    Np = _round_up(N, n_chunk)
    Rp = _round_up(R, block_r)
    if Np != N:
        src = jnp.pad(src, ((0, 0), (0, Np - N), (0, 0)))
    if Rp != R:
        idx = jnp.pad(idx, ((0, 0), (0, Rp - R)))
    out = pl.pallas_call(
        functools.partial(_gather_kernel, n_chunk=n_chunk, n=Np),
        grid=(B, Rp // block_r),
        out_shape=jax.ShapeDtypeStruct((B, Rp, C), src.dtype),
        in_specs=[
            pl.BlockSpec((1, 1, block_r), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_r, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(idx.reshape(B, 1, Rp).astype(jnp.int32), src)
    return out[:, :R]


def _gather_cols_kernel(idx_ref, srcT_ref, out_ref, *, n_chunk: int, n: int):
    # idx_ref: (1, 1, BR); srcT_ref: (1, C, N); out_ref: (1, C, BR)
    br = out_ref.shape[2]
    idx = idx_ref[0, 0, :]                   # (BR,)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    n_steps = n // n_chunk

    def body(s, acc):
        n0 = s * n_chunk
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_chunk, br), 0) + n0
        oh = (rows == idx[None, :]).astype(jnp.bfloat16)       # (CN, BR)
        chunk = srcT_ref[0, :, pl.ds(n0, n_chunk)].astype(jnp.float32)  # (C, CN)
        hi = chunk.astype(jnp.bfloat16)
        lo = (chunk - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (acc + jnp.dot(hi, oh, preferred_element_type=jnp.float32)
                + jnp.dot(lo, oh, preferred_element_type=jnp.float32))

    acc = jax.lax.fori_loop(0, n_steps, body, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _gather_cols_batched(srcT: jax.Array, idx: jax.Array, block_r: int = 512,
                         n_chunk: int = 2048) -> jax.Array:
    """srcT: (B, C, N), idx: (B, R) -> (B, C, R). For small C the transposed
    layout avoids the (N, C<128) lane-padding VMEM blowup."""
    B, C, N = srcT.shape
    R = idx.shape[1]
    n_chunk = min(n_chunk, _round_up(N, 256))
    Np = _round_up(N, n_chunk)
    Rp = _round_up(R, block_r)
    if Np != N:
        srcT = jnp.pad(srcT, ((0, 0), (0, 0), (0, Np - N)))
    if Rp != R:
        idx = jnp.pad(idx, ((0, 0), (0, Rp - R)))
    out = pl.pallas_call(
        functools.partial(_gather_cols_kernel, n_chunk=n_chunk, n=Np),
        grid=(B, Rp // block_r),
        out_shape=jax.ShapeDtypeStruct((B, C, Rp), srcT.dtype),
        in_specs=[
            pl.BlockSpec((1, 1, block_r), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Np), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, block_r), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
    )(idx.reshape(B, 1, Rp).astype(jnp.int32), srcT)
    return out[:, :, :R]


def gather_rows(src: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched row gather: src (B, N, C), idx (B, ...) -> (B, ..., C).
    Out-of-range indices return zeros. Dispatches to the transposed kernel for
    C < 128 (lane-padding economy). Integer sources roundtrip through f32
    (exact below 2^24 thanks to the hi/lo-split matmul).

    Differentiable: the VJP w.r.t. `src` is the one-hot scatter-add kernel
    (`scatter_add_rows`) — the exact transpose of the gather matmul — so the
    whole point pipeline trains on TPU without falling back to XLA's serial
    scatter."""
    return _gather_rows_vjp(src.shape[1])(src, idx)


@functools.lru_cache(maxsize=None)
def _gather_rows_vjp(n_rows: int):
    @jax.custom_vjp
    def g(src, idx):
        return _gather_rows_impl(src, idx)

    def fwd(src, idx):
        return _gather_rows_impl(src, idx), idx

    def bwd(idx, ct):
        B = idx.shape[0]
        flat_idx = idx.reshape(B, -1)
        ct_flat = ct.reshape(B, flat_idx.shape[1], ct.shape[-1])
        d_src = scatter_add_rows(ct_flat, flat_idx, n_rows).astype(ct.dtype)
        return d_src, None

    g.defvjp(fwd, bwd)
    return g


def _gather_rows_impl(src: jax.Array, idx: jax.Array) -> jax.Array:
    B, N, C = src.shape
    batch_shape = idx.shape[1:]
    # the one-hot formulation keeps the whole (N, C) table VMEM-resident and
    # spends FLOPs proportional to N — beyond ~8MB tables fall back to the XLA
    # gather (slow but correct; a DMA-tiled kernel is the round-2 fix)
    table_bytes = (N + 1) * max(C, 8 if C < 128 else 128) * 4
    if table_bytes > 8 * 1024 * 1024:
        safe_idx = jnp.clip(idx, 0, N - 1)
        out = jnp.take_along_axis(
            src, safe_idx.reshape(B, -1)[..., None], axis=1)
        out = jnp.where((idx.reshape(B, -1) >= 0)[..., None]
                        & (idx.reshape(B, -1) < N)[..., None], out, 0)
        return out.reshape((B,) + batch_shape + (C,)).astype(src.dtype)
    out_dtype = src.dtype
    if jnp.issubdtype(src.dtype, jnp.integer):
        src = src.astype(jnp.float32)
    flat_idx = idx.reshape(B, -1)
    flat_idx = jnp.where((flat_idx >= 0) & (flat_idx < N), flat_idx, N)
    src_p = jnp.pad(src, ((0, 0), (0, 1), (0, 0)))
    if C < 128:
        srcT = jnp.swapaxes(src_p, 1, 2)
        out = jnp.swapaxes(_gather_cols_batched(srcT, flat_idx), 1, 2)
    else:
        out = _gather_rows_batched(src_p, flat_idx)
    if jnp.issubdtype(out_dtype, jnp.integer):
        out = jnp.round(out).astype(out_dtype)
    return out.reshape((B,) + batch_shape + (C,))


def _scatter_kernel(idx_ref, val_ref, out_ref, *, block_r: int):
    # grid: (B, cell_tiles, r_blocks); out tile (1, TC, C) accumulated over r
    tc = out_ref.shape[1]
    ci = pl.program_id(1)
    rj = pl.program_id(2)

    @pl.when(rj == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[0, 0, :]                                    # (BR,)
    cell0 = ci * tc
    rows = jax.lax.broadcasted_iota(jnp.int32, (tc, block_r), 0) + cell0
    oh = (rows == idx[None, :]).astype(jnp.bfloat16)          # (TC, BR)
    out_ref[0] += _split_dot(oh, val_ref[0]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def scatter_add_rows(vals: jax.Array, idx: jax.Array, n_cells: int,
                     block_r: int = 1024, cell_tile: int = 2048) -> jax.Array:
    """Batched scatter-add: vals (B, R, C), idx (B, R) -> (B, n_cells, C).
    Out-of-range indices are dropped."""
    B, R, C = vals.shape
    block_r = min(block_r, _round_up(R, 256))
    Rp = _round_up(R, block_r)
    Ncp = _round_up(n_cells, cell_tile)
    idx = jnp.where((idx >= 0) & (idx < n_cells), idx, Ncp)
    if Rp != R:
        idx = jnp.pad(idx, ((0, 0), (0, Rp - R)), constant_values=Ncp)
        vals = jnp.pad(vals, ((0, 0), (0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, block_r=block_r),
        grid=(B, Ncp // cell_tile, Rp // block_r),
        out_shape=jax.ShapeDtypeStruct((B, Ncp, C), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, block_r), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r, C), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cell_tile, C), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(idx.reshape(B, 1, Rp).astype(jnp.int32), vals.astype(jnp.float32))
    return out[:, :n_cells]
