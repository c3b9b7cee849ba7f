"""Design experiments: gather locality, fused residue query, extraction fusion."""
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
    np.asarray(jax.device_get(_sum_scalars(outs)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    M, K = 4096, 48

    # ---- gather locality: random vs clustered indices
    for C in (8, 64):
        feats = jax.random.normal(key, (B, N, C), jnp.float32)
        idx_rand = jax.random.randint(key, (B, M * K), 0, N, jnp.int32)
        # clustered: each center's K indices within a +-64 window
        base = jax.random.randint(key, (B, M, 1), 64, N - 64, jnp.int32)
        off = jax.random.randint(key, (B, M, K), -64, 64, jnp.int32)
        idx_clus = (base + off).reshape(B, M * K)

        @jax.jit
        def g(f, i):
            return jnp.take_along_axis(f, i[..., None], axis=1)
        print(f'C={C} gather random:    {timeit(g, feats, idx_rand):.2f} ms')
        print(f'C={C} gather clustered: {timeit(g, feats, idx_clus):.2f} ms')

    # ---- fused residue-class query (no (B,M,N) materialization?)
    R = 1024
    G = N // R
    pts = jax.random.uniform(key, (B, N, 3), jnp.float32) * jnp.array([70.4, 80., 4.])
    ctr = pts[:, :M]

    @functools.partial(jax.jit, static_argnums=(2,))
    def firsthit(xyz, new_xyz, radius):
        x = xyz.reshape(B, 1, G, R, 3)
        c = new_xyz.reshape(B, M, 1, 1, 3)
        d2 = jnp.sum((x - c) ** 2, axis=-1)          # (B, M, G, R) - fused?
        pos = jnp.arange(N, dtype=jnp.int32).reshape(1, 1, G, R)
        hit = jnp.where(d2 < radius * radius, pos, N)
        return jnp.min(hit, axis=2)                   # (B, M, R)

    ms = timeit(firsthit, pts, ctr, 0.8)
    print(f'fused residue firsthit N={N} M={M} R={R}: {ms:.2f} ms')

    # both branches in one jit (shared d2 stream)
    @jax.jit
    def firsthit2(xyz, new_xyz):
        x = xyz.reshape(B, 1, G, R, 3)
        c = new_xyz.reshape(B, M, 1, 1, 3)
        d2 = jnp.sum((x - c) ** 2, axis=-1)
        pos = jnp.arange(N, dtype=jnp.int32).reshape(1, 1, G, R)
        h1 = jnp.min(jnp.where(d2 < 0.04, pos, N), axis=2)
        h2 = jnp.min(jnp.where(d2 < 0.64, pos, N), axis=2)
        return h1, h2
    ms = timeit(firsthit2, pts, ctr)
    print(f'fused residue firsthit x2 radii: {ms:.2f} ms')

    # ---- extraction matmul with fused one-hot generation over R
    rank = jax.random.randint(key, (B * M, R), 0, 64, jnp.int32)
    vals = jax.random.randint(key, (B * M, R), 0, N, jnp.int32)

    @jax.jit
    def extract(rank, vals):
        oh = (rank[:, None, :] == jnp.arange(K, dtype=jnp.int32)[None, :, None])
        ohb = oh.astype(jnp.bfloat16)                 # (BM, K, R)
        hi = (vals // 128).astype(jnp.bfloat16)
        lo = (vals % 128).astype(jnp.bfloat16)
        dn = (((2,), (1,)), ((0,), (0,)))
        ih = jax.lax.dot_general(ohb, hi[:, :, None], dn, preferred_element_type=jnp.float32)
        il = jax.lax.dot_general(ohb, lo[:, :, None], dn, preferred_element_type=jnp.float32)
        return (ih * 128 + il)[..., 0].astype(jnp.int32)
    ms = timeit(extract, rank, vals)
    print(f'index extraction (BM={B*M}, K={K}, R={R}): {ms:.2f} ms')

    # ---- window row-gather: (B, n_cells, 3*CAP*8ch) wide rows, 3 per center
    n_cells, CAP, C8 = 8800, 32, 8
    t3 = jax.random.normal(key, (B, n_cells, 3 * CAP * C8), jnp.float32)
    ci = jax.random.randint(key, (B, M), 110, n_cells - 110, jnp.int32)

    @jax.jit
    def win(t, ci):
        outs = [jnp.take_along_axis(t, (ci + dy * 110)[..., None], axis=1)
                for dy in (-1, 0, 1)]
        return jnp.concatenate(outs, axis=-1)         # (B, M, 9*CAP*8)
    ms = timeit(win, t3, ci)
    byts = B * M * 9 * CAP * C8 * 4
    print(f'window row-gather (3 wide rows/center): {ms:.2f} ms ({byts/ms*1e-6:.0f} GB/s)')

    # ---- local extraction matmul bf16 (B*M, K, 288) @ (B*M, 288, 8)
    ncand = 288
    ohr = jax.random.randint(key, (B * M, ncand), 0, 64, jnp.int32)
    wdat = jax.random.normal(key, (B * M, ncand, C8), jnp.bfloat16)

    @jax.jit
    def lext(rank, w):
        oh = (rank[:, None, :] == jnp.arange(K, dtype=jnp.int32)[None, :, None]).astype(jnp.bfloat16)
        dn = (((2,), (1,)), ((0,), (0,)))
        return jax.lax.dot_general(oh, w, dn, preferred_element_type=jnp.float32)
    ms = timeit(lext, ohr, wdat)
    fl = B * M * K * ncand * C8 * 2
    print(f'local window extraction matmul: {ms:.2f} ms ({fl/ms*1e-9:.2f} TF/s)')

    # ---- argsort 16k (for device-side table build)
    cell = jax.random.randint(key, (B, N), 0, n_cells, jnp.int32)

    @jax.jit
    def srt(c):
        return jnp.argsort(c, axis=1)
    print(f'argsort (B,{N}): {timeit(srt, cell):.2f} ms')

    # scatter table build
    from pdm_ssd_tpu.ops.neighbor_grid import build_bucket_table
    ms = timeit(functools.partial(build_bucket_table, cell_size=0.8,
                                  grid_wh=(90, 102), cap=32, pc_min=(0.0, -40.0)), pts)
    print(f'build_bucket_table (idx only): {ms:.2f} ms')


if __name__ == '__main__':
    main()
