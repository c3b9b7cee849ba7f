"""Round-2 design microbenchmarks (run on the real TPU).

Measures the primitives that decide the fast point-exact SA design:
 - XLA row gather at production shapes
 - one-hot extraction matmuls (XLA) at window sizes
 - current Pallas grid query / group kernels per level
 - FPS kernel per level
 - full point-exact model forward
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, N = 8, 16384


def _fetch(out):
    """Force a real device->host fetch (the axon tunnel is fully async;
    block_until_ready alone does not synchronize)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _scalar(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return leaf.ravel()[0]


@jax.jit
def _sum_scalars(xs):
    return sum(jnp.asarray(x, jnp.float32).ravel()[0] for x in xs)


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    outs = [_scalar(fn(*args)) for _ in range(n)]
    np.asarray(jax.device_get(_sum_scalars(outs)))  # ONE round trip syncs all
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    key = jax.random.PRNGKey(0)
    print('devices:', jax.devices())

    # ---- 1. XLA row gather: (B, N, C) by (B, MK) -> (B, MK, C)
    for (M, K, C) in [(4096, 48, 8), (1024, 48, 128), (512, 48, 128)]:
        feats = jax.random.normal(key, (B, N, C), jnp.float32)
        idx = jax.random.randint(key, (B, M * K), 0, N, jnp.int32)

        @jax.jit
        def g(f, i):
            return jnp.take_along_axis(f, i[..., None], axis=1)
        ms = timeit(g, feats, idx)
        rows = B * M * K
        print(f'xla row gather M={M} K={K} C={C}: {ms:.2f} ms '
              f'({ms*1e6/rows:.0f} ns/row, {rows*C*4/ms*1e-6:.1f} GB/s)')

    # ---- 2. one-hot extraction as XLA einsum over per-center windows
    # simulate: windows (B*M, n_cand, C) [materialized], onehot (B*M, K, n_cand)
    for (M, K, ncand, C) in [(1024, 48, 288, 128)]:
        win = jax.random.normal(key, (B * M, ncand, C), jnp.bfloat16)
        oh = jax.random.normal(key, (B * M, K, ncand), jnp.bfloat16)

        @jax.jit
        def ext(o, w):
            return jax.lax.dot_general(o, w, (((2,), (1,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32)
        ms = timeit(ext, oh, win)
        fl = B * M * K * ncand * C * 2
        print(f'xla batched onehot extract M={M}: {ms:.2f} ms ({fl/ms*1e-9:.2f} TF/s)')

    # ---- 3. window materialization cost: stacked rolls of slot-major table
    n_cells, CAP, C = 8800, 32, 128
    table = jax.random.normal(key, (B, n_cells * CAP, C), jnp.bfloat16)
    cellidx = jax.random.randint(key, (B, 4096), 0, n_cells - 2, jnp.int32)

    @jax.jit
    def win3(t, ci):
        # per center: 3 row-strips of 3*CAP contiguous rows (one per dy)
        t4 = t.reshape(B, n_cells, CAP * C)
        out = []
        for dy in (-1, 0, 1):
            rows = jnp.concatenate([
                jnp.take_along_axis(t4, (ci + dy * 110 + dx)[..., None], axis=1)
                for dx in (-1, 0, 1)], axis=-1)
            out.append(rows)
        return jnp.concatenate(out, axis=-1)  # (B, M, 9*CAP*C)
    ms = timeit(win3, table, cellidx)
    byts = B * 4096 * 9 * CAP * C * 2
    print(f'window gather via take_along (M=4096, 9 cells): {ms:.2f} ms ({byts/ms*1e-6:.0f} GB/s)')

    # ---- 4. lax.sort with payload at (B, N)
    keys = jax.random.randint(key, (B, N), 0, 1 << 20, jnp.int32)
    payload = jax.random.normal(key, (B, N, 8), jnp.float32)

    @jax.jit
    def s(k, p):
        order = jnp.argsort(k, axis=1)
        return jnp.take_along_axis(p, order[..., None], axis=1)
    ms = timeit(s, keys, payload)
    print(f'argsort(B,{N}) + payload gather C=8: {ms:.2f} ms')

    # ---- 5. existing kernels per level
    from pdm_ssd_tpu.ops.pallas.fps import farthest_point_sample_pallas
    from pdm_ssd_tpu.ops.pallas.retired.grid_query import grid_ball_query_pallas
    pts = jax.random.uniform(key, (B, N, 3), jnp.float32) * jnp.array([70.4, 80., 4.]) + jnp.array([0., -40., -3.])
    pc = (0.0, -40.0, 70.4, 40.0)
    lvls = [(N, 4096), (4096, 1024), (1024, 512)]
    xs = pts
    for i, (n_in, m) in enumerate(lvls):
        x = xs[:, :n_in]
        ms = timeit(functools.partial(farthest_point_sample_pallas, npoint=m), x)
        print(f'fps L{i} {n_in}->{m}: {ms:.2f} ms')
    radii = [(0.2, 16), (0.8, 32), (0.8, 16), (1.6, 32), (1.6, 16), (3.2, 32)]
    shapes = [(N, 4096), (N, 4096), (4096, 1024), (4096, 1024), (1024, 512), (1024, 512)]
    for (r, k), (n_in, m) in zip(radii, shapes):
        x = pts[:, :n_in]
        c = pts[:, :m]
        ms = timeit(functools.partial(grid_ball_query_pallas, r, k, pc_range=pc), x, c)
        print(f'grid_ball_query r={r} K={k} N={n_in} M={m}: {ms:.2f} ms')

    # ---- 6. onehot gather (current TPU grouping path) at level shapes
    from pdm_ssd_tpu.ops.pallas.retired.onehot_gather import gather_rows
    for (n_in, m, k, c) in [(N, 4096, 32, 1), (4096, 1024, 32, 96), (1024, 512, 32, 256)]:
        f = jax.random.normal(key, (B, n_in, c), jnp.float32)
        i = jax.random.randint(key, (B, m, k), 0, n_in, jnp.int32)
        ms = timeit(gather_rows, f, i)
        print(f'gather_rows N={n_in} M={m} K={k} C={c}: {ms:.2f} ms')


if __name__ == '__main__':
    main()
