"""Fused-SA breakdown at the pdm_ssd_point config shapes (TPU).

Unrolled 10-loop harness: ~3.2 ms/iter floor from the 32 ms call latency;
numbers above ~5 ms are real compute.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

LOOPS = 10
B = 8


def _fetch(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))


def bench(name, fn, *args, reps=3):
    @jax.jit
    def looped(*a):
        carry = jnp.float32(0)
        for _ in range(LOOPS):
            out = fn(*a, carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            carry = carry + jnp.sum(leaf.ravel()[:1]).astype(jnp.float32) * 1e-20
        return carry

    _fetch(looped(*args))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(looped(*args))
        best = min(best, (time.perf_counter() - t0) / LOOPS * 1e3)
    print(f'{name}: {best:.2f} ms', flush=True)
    return best


def main():
    from pdm_ssd_tpu.ops import sa_fused
    from pdm_ssd_tpu.ops.pallas.fps import farthest_point_sample_pallas

    key = jax.random.PRNGKey(0)
    PC = (0.0, -40.0, 70.4, 40.0)
    # level shapes: (N, M, radii, Ks, payload C)
    levels = [
        ('L1', 16384, 4096, (0.2, 0.8), (16, 32), 48),
        ('L2', 4096, 1024, (0.8, 1.6), (16, 32), 128),
        ('L3', 1024, 512, (1.6, 3.2), (16, 32), 256),
    ]
    for tag, N, M, radii, Ks, C in levels:
        pts = jax.random.uniform(key, (B, N, 3)) * jnp.array([70.4, 80., 4.]) \
            + jnp.array([0., -40., -3.])
        pay = jax.random.normal(key, (B, N, C), jnp.float32)
        ctr = pts[:, :M]
        cs = max(radii)
        gw = sa_fused.grid_dims(PC, cs)
        pc_min = (PC[0] - cs, PC[1] - cs)

        bench(f'{tag} table build (n_cells={gw[0]*gw[1]}, D={C+4})',
              lambda p, f, s: sa_fused.build_payload_table(
                  p + s, f, cs, gw, 32, pc_min), pts, pay)

        table = sa_fused.build_payload_table(pts, pay, cs, gw, 32, pc_min)
        bench(f'{tag} window_group (M={M})',
              lambda t, c, s: sa_fused.window_group(
                  t + s, c, list(radii), list(Ks), cs, gw, 32, pc_min),
              table, ctr)

        bench(f'{tag} full fused_query_group',
              lambda p, f, c, s: sa_fused.fused_query_group(
                  list(radii), list(Ks), p + s, f, c, PC, cap=32),
              pts, pay, ctr)

        bench(f'{tag} fps {N}->{M}',
              lambda p, s, m=M: farthest_point_sample_pallas(p + s, m), pts)


if __name__ == '__main__':
    main()
