"""Round-3 sparse-conv gather strategy shootout (TPU v5e).

The sparse ladder is XLA row-gather latency bound (~6 ns/row x 24.6 M rows
per SECOND batch, BENCH_NOTES round 3).  Candidates measured here, all at
one production-shaped layer (V=52k actives, C=64, K=27 taps):

  A. XLA take_along_axis, 27 rows of C        (the shipped baseline)
  B. A with a bf16 table                      (halves bytes; latency test)
  C. XLA 9 rows of 3C (xwin layout, layer-local)
  D. Pallas fused windowed gather+conv: the slot table is sorted by
     (z, y, x) key, so within a block of BS consecutive output slots each
     (dz, dy) tap group's neighbor indices lie in a contiguous window of
     the input table.  The table is stored PACKED: P = 128//C voxels per
     128-lane row, so window DMAs are tile-aligned and the one-hot
     selector is (BS, W/P) — P times cheaper to build.  Per tap:
     (BS, W/P) @ (W/P, 128) MXU matmul gathers packed rows, a P-way lane
     select extracts the voxel, and the conv matmul accumulates
     (BS, C) @ (C, Cout).  One kernel per layer, no XLA gather anywhere.
  E. D with bf16 table + bf16 one-hot (MXU native rate).

Out-of-window indices produce all-zero one-hot rows, so absent taps (index
== V) contribute nothing — exactness needs only the host guarantee that
real neighbors stay within the per-(block, group) window (checked here).
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOOPS = 10
V, C, K, COUT = 52224, 64, 27, 64
BS, W = 256, 512
NB = V // BS
P = 128 // C                     # voxels per packed 128-lane row
WR = W // P + 32                 # packed window rows (+alignment slack)
VR = (V + 1 + 8 * P) // P // 8 * 8 + 8


def _fetch(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))


def bench(name, fn, *args, reps=3, flops=None, byts=None):
    @jax.jit
    def looped(*a):
        carry = jnp.float32(0)
        for _ in range(LOOPS):
            out = fn(*a, carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            carry = carry + leaf.ravel()[0].astype(jnp.float32) * 1e-20
        return carry

    _fetch(looped(*args))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(looped(*args))
        best = min(best, (time.perf_counter() - t0) / LOOPS * 1e3)
    extra = ''
    if flops:
        extra += f' ({flops / best * 1e-9:.2f} TF/s)'
    if byts:
        extra += f' ({byts / best * 1e-6:.0f} GB/s)'
    print(f'{name}: {best:.3f} ms{extra}', flush=True)
    return best


def make_maps(rng):
    """Production-like neighbor maps: idx[v, k] ~ v + group offset + noise,
    monotone per tap group with bounded in-block spread, ~10% absent."""
    base = np.arange(V)[:, None]
    goff = rng.integers(-40, 40, size=(1, K))
    noise = rng.integers(-8, 8, size=(V, K))
    idx = np.clip(base + goff + noise, 0, V - 1)
    absent = rng.random((V, K)) < 0.10
    idx[absent] = V
    return idx.astype(np.int32)


def main():
    jax.config.update('jax_default_matmul_precision', 'bfloat16')
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((V + 1, C)), jnp.float32)
    table = table.at[V].set(0.0)
    idx = jnp.asarray(make_maps(rng))
    wconv = jnp.asarray(rng.standard_normal((K * C, COUT)) * 0.02, jnp.float32)

    # ---- A: XLA row gather, 27 x C ----
    def xla27(table, idx, wconv, s):
        t = table + s
        g = t[idx]                                  # (V, K, C)
        return g.reshape(V, K * C) @ wconv

    bench('A  xla gather 27xC f32   ', xla27, table, idx, wconv,
          byts=V * K * C * 4)

    # ---- B: bf16 table ----
    bench('B  xla gather 27xC bf16  ', xla27, table.astype(jnp.bfloat16), idx,
          wconv.astype(jnp.bfloat16), byts=V * K * C * 2)

    # ---- C: 9 gathers of 3C-wide rows ----
    t3 = jnp.concatenate([
        jnp.concatenate([jnp.zeros((1, C)), table[:-1]], 0),
        table,
        jnp.concatenate([table[1:], jnp.zeros((1, C))], 0)], axis=-1)
    idx9 = idx.reshape(V, 9, 3)[:, :, 1]            # window-center stand-in

    def xla9(t3, idx9, wconv, s):
        g = (t3 + s)[idx9]                          # (V, 9, 3C)
        return g.reshape(V, K * C) @ wconv

    bench('C  xla gather 9x3C f32   ', xla9, t3, idx9, wconv,
          byts=V * 9 * 3 * C * 4)

    # ---- D/E: Pallas fused windowed gather + conv ----
    # packed table: row r holds voxels [rP, rP+P), zero-padded
    tp = np.zeros((VR * P, C), np.float32)
    tp[:V] = np.asarray(table)[:V]
    table_packed = jnp.asarray(tp.reshape(VR, P * C))

    # host-side per-(block, group) packed-window starts (8-row aligned)
    idx_h = np.asarray(idx)
    g_idx = idx_h.reshape(NB, BS, 9, 3)
    real = g_idx < V
    lo = np.where(real, g_idx, 2**30).min(axis=(1, 3))          # (NB, 9)
    lo_row = np.clip(lo // P // 16 * 16, 0, (VR - WR) // 16 * 16).astype(np.int32)
    spread = (np.where(real, g_idx, -1).max(axis=(1, 3)) // P) - lo_row
    print(f'   packed window spread: max {spread.max()}, WR = {WR}')
    assert spread.max() < WR, 'window too small for synthetic maps'
    lo_j = jnp.asarray(lo_row)

    def make_kernel(dtype):
        def kernel(lo_ref, idx_ref, table_ref, w_ref, out_ref, win, sem):
            b = pl.program_id(0)
            for g in range(9):
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(pl.multiple_of(lo_ref[b, g], 16), WR)],
                    win.at[g], sem.at[g]).start()
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (BS, WR), 1)
            acc = jnp.zeros((BS, COUT), jnp.float32)
            for g in range(9):
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(pl.multiple_of(lo_ref[b, g], 16), WR)],
                    win.at[g], sem.at[g]).wait()
                wg = win[g]                          # (WR, P*C)
                for t in range(3):
                    k = 3 * g + t
                    iv = idx_ref[:, k][:, None]      # (BS, 1) voxel index
                    rel = iv // P - lo_ref[b, g]
                    onehot = (iota_w == rel).astype(dtype)
                    packed = jnp.dot(onehot, wg,
                                     preferred_element_type=jnp.float32)
                    if P > 1:
                        pi = iv % P                  # (BS, 1)
                        gat = jnp.zeros((BS, C), jnp.float32)
                        for p in range(P):
                            gat = gat + jnp.where(
                                pi == p, packed[:, p * C:(p + 1) * C], 0.0)
                    else:
                        gat = packed
                    acc = acc + jnp.dot(
                        gat.astype(dtype), w_ref[k],
                        preferred_element_type=jnp.float32)
            out_ref[:] = acc
        return kernel

    def run_pallas(dtype, table_packed, wconv):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((BS, K), lambda b, lo: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BS, COUT), lambda b, lo: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((9, WR, P * C), dtype),
                pltpu.SemaphoreType.DMA((9,)),
            ],
        )
        return pl.pallas_call(
            make_kernel(dtype),
            out_shape=jax.ShapeDtypeStruct((V, COUT), jnp.float32),
            grid_spec=grid_spec,
        )(lo_j, idx, table_packed.astype(dtype),
          wconv.reshape(K, C, COUT).astype(dtype))

    # correctness vs A
    ref = np.asarray(xla27(table, idx, wconv, 0.0))
    got = np.asarray(run_pallas(jnp.float32, table_packed, wconv))
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    print(f'   pallas f32 rel err vs XLA: {err:.2e}', flush=True)

    oh_flops = 2 * V * K * WR * 128 + 2 * V * K * C * COUT
    bench('D  pallas win-onehot f32 ',
          lambda t, w, s: run_pallas(jnp.float32, t + s, w),
          table_packed, wconv, flops=oh_flops)
    bench('E  pallas win-onehot bf16',
          lambda t, w, s: run_pallas(jnp.bfloat16, t + s, w),
          table_packed, wconv, flops=oh_flops)


if __name__ == '__main__':
    main()
