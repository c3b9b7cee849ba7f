"""In-graph microbenchmarks: each op runs LOOPS times inside one jitted scan,
so per-call tunnel/dispatch overhead is amortized away. The carry perturbs the
inputs each iteration to defeat CSE."""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, N = 8, 16384
LOOPS = 10


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def bench(name, fn, *args, reps=3):
    """fn(*args, salt) -> array; measured inside a LOOPS-scan."""

    @jax.jit
    def looped(*a):
        carry = jnp.float32(0)
        for _ in range(LOOPS):  # fully unrolled: one XLA computation
            out = fn(*a, carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            carry = carry + leaf.ravel()[0].astype(jnp.float32) * 1e-20
        return carry

    _fetch(looped(*args))  # compile+warm
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(looped(*args))
        best = min(best, (time.perf_counter() - t0) / LOOPS * 1e3)
    print(f'{name}: {best:.2f} ms')
    return best


def main():
    key = jax.random.PRNGKey(0)

    # ---- row gathers at level shapes
    for (tag, M, K, C, n_in) in [('L1', 4096, 48, 8, N), ('L2', 1024, 48, 136, 4096),
                                 ('L3', 512, 48, 264, 1024)]:
        feats = jax.random.normal(key, (B, n_in, C), jnp.float32)
        idx = jax.random.randint(key, (B, M * K), 0, n_in, jnp.int32)

        def g(f, i, salt):
            return jnp.take_along_axis(f + salt, i[..., None], axis=1)
        bench(f'gather {tag} ({B}x{M}x{K} rows, C={C})', g, feats, idx)

    # ---- residue firsthit (dense query) at level shapes
    for (tag, n_in, M, R) in [('L1', N, 4096, 1024), ('L2', 4096, 1024, 1024),
                              ('L3', 1024, 512, 1024)]:
        G = n_in // R
        pts = jax.random.uniform(key, (B, n_in, 3), jnp.float32) * jnp.array([70.4, 80., 4.])
        ctr = pts[:, :M]

        def fh(xyz, new_xyz, salt):
            x = xyz.reshape(B, 1, G, R, 3) + salt
            c = new_xyz.reshape(B, M, 1, 1, 3)
            d2 = jnp.sum((x - c) ** 2, axis=-1)
            pos = jnp.arange(n_in, dtype=jnp.int32).reshape(1, 1, G, R)
            h1 = jnp.min(jnp.where(d2 < 0.04, pos, n_in), axis=2)
            h2 = jnp.min(jnp.where(d2 < 0.64, pos, n_in), axis=2)
            return h1 + h2
        bench(f'residue firsthit x2 {tag} (N={n_in}, M={M})', fh, pts, ctr)

    # ---- index extraction over R classes
    for (tag, M, R, K) in [('L1', 4096, 1024, 48), ('L2', 1024, 1024, 48)]:
        rank = jax.random.randint(key, (B * M, R), 0, 64, jnp.int32)
        vals = jax.random.randint(key, (B * M, R), 0, N, jnp.int32)

        def extract(rank, vals, salt):
            oh = (rank[:, None, :] == jnp.arange(K, dtype=jnp.int32)[None, :, None])
            ohb = oh.astype(jnp.bfloat16) + salt.astype(jnp.bfloat16) * 0
            hi = (vals // 128).astype(jnp.bfloat16)
            lo = (vals % 128).astype(jnp.bfloat16)
            dn = (((2,), (1,)), ((0,), (0,)))
            ih = jax.lax.dot_general(ohb, hi[:, :, None], dn, preferred_element_type=jnp.float32)
            il = jax.lax.dot_general(ohb, lo[:, :, None], dn, preferred_element_type=jnp.float32)
            return (ih * 128 + il)[..., 0].astype(jnp.int32)
        bench(f'idx extraction {tag} (BM={B*M}, K={K}, R={R})', extract, rank, vals)

    # ---- window path pieces (L1)
    n_cells, CAP, C8, M = 8800, 32, 8, 4096
    t3 = jax.random.normal(key, (B, n_cells, 3 * CAP * C8), jnp.float32)
    ci = jax.random.randint(key, (B, M), 110, n_cells - 110, jnp.int32)

    def win(t, ci, salt):
        outs = [jnp.take_along_axis(t + salt, (ci + dy * 110)[..., None], axis=1)
                for dy in (-1, 0, 1)]
        return jnp.concatenate(outs, axis=-1)
    bench('L1 window row-gather (3 rows/center)', win, t3, ci)

    ncand, K = 288, 48
    ohr = jax.random.randint(key, (B * M, ncand), 0, 64, jnp.int32)
    wdat = jax.random.normal(key, (B * M, ncand, C8), jnp.bfloat16)

    def lext(rank, w, salt):
        oh = (rank[:, None, :] == jnp.arange(K, dtype=jnp.int32)[None, :, None]).astype(jnp.bfloat16)
        dn = (((2,), (1,)), ((0,), (0,)))
        return jax.lax.dot_general(oh, w + salt.astype(jnp.bfloat16), dn,
                                   preferred_element_type=jnp.float32)
    bench('L1 local extraction matmul (48x288x8)', lext, ohr, wdat)

    cell = jax.random.randint(key, (B, N), 0, n_cells, jnp.int32)

    def srt(c, salt):
        return jnp.argsort(c + (salt * 0).astype(jnp.int32), axis=1)
    bench('argsort (B,16384)', srt, cell)

    # ---- pallas kernels in-graph
    from pdm_ssd_tpu.ops.pallas.fps import farthest_point_sample_pallas
    pts = jax.random.uniform(key, (B, N, 3), jnp.float32) * jnp.array([70.4, 80., 4.])
    for (n_in, m) in [(N, 4096), (4096, 1024), (1024, 512)]:
        def f(x, salt):
            return farthest_point_sample_pallas(x + salt, m)
        bench(f'pallas fps {n_in}->{m}', f, pts[:, :n_in])

    # ---- MLP stacks at grouped shapes (bf16)
    for (tag, M, K, ci, width) in [('L1b2', 4096, 32, 4, (32, 32, 64)),
                                   ('L2b2', 1024, 32, 99, (64, 96, 128)),
                                   ('L3b2', 512, 32, 259, (128, 196, 256))]:
        x = jax.random.normal(key, (B * M * K, ci), jnp.bfloat16)
        ws = []
        prev = ci
        for w in width:
            ws.append(jax.random.normal(key, (prev, w), jnp.bfloat16))
            prev = w

        def mlp(x, *wsalt):
            ws_, salt = wsalt[:-1], wsalt[-1]
            h = x + salt.astype(jnp.bfloat16)
            for w in ws_:
                h = jnp.maximum(jax.lax.dot(h, w, preferred_element_type=jnp.float32), 0).astype(jnp.bfloat16)
            return h
        bench(f'mlp {tag} ({B*M*K}x{width})', mlp, x, *ws)


if __name__ == '__main__':
    main()
