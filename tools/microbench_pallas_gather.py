"""Round-3 experiment: can a Pallas kernel beat XLA's dynamic row gather?

XLA:TPU's gather is scalar-issue bound (~6 ns/row regardless of row width
up to ~3C; BENCH_NOTES round-2/3 calibrations) — that floor sets the sparse
ladder's 121 ms. The one untried lever is Mosaic's vectorized dynamic
gather (`jnp.take(table, idx_vec, axis=0)` lowered inside a kernel with the
table VMEM-resident): if it issues VECTOR indices instead of one scalar
address per row, it sidesteps the scalar-core floor entirely.

Usage: python tools/microbench_pallas_gather.py

Shapes mirror the stage-2 submanifold conv of the 0.05 m KITTI ladder
(B=2, V=52000 slots, C=32, 9 window rows of 3C per output site, bf16).
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_default_matmul_precision', 'bfloat16')


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def make_case(rng, V=52000, C=32, G=9, dtype=jnp.bfloat16):
    table = jnp.asarray(rng.standard_normal((V + 2, 3 * C)), dtype)
    idx = jnp.asarray(rng.integers(0, V + 2, size=(V, G)), jnp.int32)
    return table, idx


def xla_gather(table, idx):
    V, G = idx.shape
    return table[idx.reshape(-1)].reshape(V, G * table.shape[1])


def pallas_gather_take(table, idx, block=1024):
    """Vectorized take inside the kernel; table fully VMEM-resident."""
    V, G = idx.shape
    R = table.shape[1]

    def kernel(idx_ref, table_ref, out_ref):
        ids = idx_ref[:].reshape(-1)                     # (block*G,)
        out_ref[:] = jnp.take(table_ref[:], ids, axis=0,
                              fill_value=0).reshape(idx_ref.shape[0], G * R)

    grid = (V // block,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, G), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, G * R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, G * R), table.dtype),
    )(idx, table)


def pallas_gather_loop(table, idx, block=512):
    """Scalar fori_loop of dynamic slices (the expected-slow baseline)."""
    V, G = idx.shape
    R = table.shape[1]

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            for k in range(G):
                j = idx_ref[i, k]
                out_ref[i, pl.ds(k * R, R)] = table_ref[j, :]
            return 0
        jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)

    return pl.pallas_call(
        kernel,
        grid=(V // block,),
        in_specs=[
            pl.BlockSpec((block, G), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, G * R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, G * R), table.dtype),
    )(idx, table)


def main():
    rng = np.random.default_rng(0)
    table, idx = make_case(rng)
    V, G = idx.shape
    R = table.shape[1]
    rows = V * G
    bytes_rows = rows * R * table.dtype.dtype.itemsize

    ref = np.asarray(xla_gather(table, idx), np.float32)

    t_xla = timeit(jax.jit(xla_gather), table, idx)
    print(f'XLA gather:        {t_xla:7.2f} ms  '
          f'{t_xla * 1e6 / rows:6.2f} ns/row  '
          f'{bytes_rows / t_xla / 1e6:7.1f} GB/s')

    for name, fn in [('pallas take', pallas_gather_take),
                     ('pallas loop', pallas_gather_loop)]:
        try:
            got = np.asarray(jax.jit(fn)(table, idx), np.float32)
            ok = np.array_equal(got, ref)
            t = timeit(jax.jit(fn), table, idx)
            print(f'{name}: {t:7.2f} ms  {t * 1e6 / rows:6.2f} ns/row  '
                  f'{bytes_rows / t / 1e6:7.1f} GB/s  exact={ok}')
        except Exception as e:
            print(f'{name}: FAILED {type(e).__name__}: {str(e)[:300]}')


if __name__ == '__main__':
    main()
