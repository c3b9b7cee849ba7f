"""Round-3 experiment: can a Pallas kernel beat XLA's dynamic row gather?

XLA:TPU's gather is scalar-issue bound (~5.5 ns/row regardless of row width
up to ~3C; BENCH_NOTES round-2/3 calibrations) — that floor sets the sparse
ladder's 121 ms. The one untried lever is Mosaic's vectorized dynamic
gather (`tpu.dynamic_gather`, reachable via `jnp.take_along_axis` with
operand/indices/output all the SAME 2D shape — lowering rule
`jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule`): if it issues
VECTOR indices instead of one scalar address per row, it sidesteps the
scalar-core floor entirely.

Usage: python tools/microbench_pallas_gather.py

Shapes mirror the stage-2 submanifold conv of the 0.05 m KITTI ladder
(V=52000 slots, 3C=96-channel xwin rows, 9 window rows per output site,
bf16). The Pallas variants measure the primitive as a same-size row
permutation-with-repeats (table (V, R), indices (V, R) -> out (V, R)),
which is the only form Mosaic lowers; ns/row comparability holds because
both move one R-wide row per index.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_default_matmul_precision', 'bfloat16')


def timeit(fn, table, idx, reps=20):
    """Single-dispatch in-graph loop with varied indices per iteration and
    a scalar reduction of every output — immune to tunnel dispatch cost,
    request dedup and cross-call overlap (repo bench methodology)."""
    @jax.jit
    def run(table, idx):
        def body(i, acc):
            out = fn(table, (idx + i) % table.shape[0])
            return acc + out.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    np.asarray(jax.device_get(run(table, idx)))          # compile + warm
    t0 = time.perf_counter()
    np.asarray(jax.device_get(run(table, idx)))
    return (time.perf_counter() - t0) / reps * 1e3


def make_case(rng, V=52000, C=32, G=9, dtype=jnp.bfloat16):
    table = jnp.asarray(rng.standard_normal((V, 3 * C)), dtype)
    idx = jnp.asarray(rng.integers(0, V, size=(V, G)), jnp.int32)
    return table, idx


def xla_gather(table, idx):
    V, G = idx.shape
    return table[idx.reshape(-1)].reshape(V, G * table.shape[1])


def xla_gather_same_shape(table, idx1):
    """One row per table row (the exact shape the Pallas variant uses)."""
    return table[idx1]


def pallas_dynamic_gather(table, idx1, block=None):
    """tpu.dynamic_gather via same-shape take_along_axis; whole table and
    indices VMEM-resident."""
    V, R = table.shape

    def kernel(idx_ref, table_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (V, R))
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx2, axis=0)

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, R), table.dtype),
    )(idx1, table)


def pallas_dynamic_gather_blocked(table, idx1, block=2048):
    """Same primitive, output blocked over a grid so only a block of
    indices/output is resident per step (table stays whole)."""
    V, R = table.shape

    def kernel(idx_ref, table_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None],
                                (idx_ref.shape[0], R))
        # operand must equal indices shape: slice table is NOT allowed
        # (indices address the whole table), so this variant only works
        # when Mosaic accepts operand shape != block shape -> expect fail
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx2, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(V // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, R), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, R), table.dtype),
    )(idx1, table)


def main():
    rng = np.random.default_rng(0)
    table, idx = make_case(rng)
    V, G = idx.shape
    R = table.shape[1]

    rows = V * G
    t_xla = timeit(xla_gather, table, idx)
    print(f'XLA gather (V*9 rows):   {t_xla:7.2f} ms  '
          f'{t_xla * 1e6 / rows:6.2f} ns/row  '
          f'{rows * R * 2 / t_xla / 1e6:7.1f} GB/s')

    idx1 = idx[:, 0]
    ref1 = np.asarray(xla_gather_same_shape(table, idx1), np.float32)
    t1 = timeit(xla_gather_same_shape, table, idx1)
    print(f'XLA gather (V rows):     {t1:7.2f} ms  '
          f'{t1 * 1e6 / V:6.2f} ns/row  {V * R * 2 / t1 / 1e6:7.1f} GB/s')

    for name, fn in [('pallas dynamic_gather  ', pallas_dynamic_gather),
                     ('pallas dg blocked      ',
                      pallas_dynamic_gather_blocked)]:
        try:
            got = np.asarray(jax.jit(fn)(table, idx1), np.float32)
            ok = np.array_equal(got, ref1)
            t = timeit(fn, table, idx1)
            print(f'{name}: {t:7.2f} ms  {t * 1e6 / V:6.2f} ns/row  '
                  f'{V * R * 2 / t / 1e6:7.1f} GB/s  exact={ok}')
        except Exception as e:
            print(f'{name}: FAILED {type(e).__name__}: {str(e)[:200]}')


if __name__ == '__main__':
    main()
