"""TPU kernel parity checks (run on real TPU; the CPU test suite can't reach
the Pallas kernels).

Validates, against the pure-JAX reference semantics in `pdm_ssd_tpu.ops`:
- Pallas FPS == reference FPS (exact index match),
- grid-hash ball query: all selected neighbors within radius; neighbor-count
  parity with the exact ball query on realistic densities,
- one-hot matmul gather == XLA gather (bf16 tolerance),
- one-hot matmul scatter-add == XLA scatter-add.

Usage: python tools/tpu_kernel_check.py
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from pdm_ssd_tpu.ops import pointnet2 as ref
    from pdm_ssd_tpu.ops.pallas.fps import farthest_point_sample_pallas
    from pdm_ssd_tpu.ops.pallas.retired.onehot_gather import gather_rows, scatter_add_rows
    from pdm_ssd_tpu.ops.neighbor_grid import grid_ball_query

    rng = np.random.RandomState(0)
    failures = []

    # --- FPS parity ---
    xyz = jnp.asarray(rng.randn(2, 1024, 3).astype(np.float32) * 10)
    want = np.asarray(jax.device_get(ref.farthest_point_sample(xyz, 256)))
    got = np.asarray(jax.device_get(farthest_point_sample_pallas(xyz, 256)))
    if (want == got).all():
        print('PASS fps: pallas == reference (exact)')
    else:
        failures.append('fps')
        print(f'FAIL fps: {np.mean(want == got):.4f} match rate')

    # --- grid ball query ---
    pts = np.stack([rng.uniform(0, 70.4, (2, 8192)), rng.uniform(-40, 40, (2, 8192)),
                    rng.uniform(-3, 1, (2, 8192))], -1).astype(np.float32)
    xyz = jnp.asarray(pts)
    cen = xyz[:, :1024]
    idx = np.asarray(jax.device_get(grid_ball_query(
        0.8, 16, xyz, cen, cap=48, pc_range=(0., -40., 70.4, 40.))))
    d = np.linalg.norm(
        pts[0][idx[0]] - np.asarray(cen)[0][:, None, :], axis=-1)
    # non-backfill slots must be inside the ball; backfill repeats an in-ball hit
    within = (d < 0.8 + 1e-4)
    # empty balls give idx 0 everywhere; exclude centers with all-zero idx
    nonzero = (idx[0] != 0).any(axis=1)
    frac = within[nonzero].mean()
    exact = np.asarray(jax.device_get(ref.ball_query(0.8, 16, xyz[:1], cen[:1])))
    cnt_g = np.array([len(set(r.tolist())) for r in idx[0][:512]])
    cnt_e = np.array([len(set(r.tolist())) for r in exact[0][:512]])
    if frac > 0.999 and abs(cnt_g.mean() - cnt_e.mean()) < 0.1:
        print(f'PASS grid_ball_query: within-radius {frac:.4f}, '
              f'count {cnt_g.mean():.2f} vs exact {cnt_e.mean():.2f}')
    else:
        failures.append('grid_ball_query')
        print(f'FAIL grid_ball_query: within {frac}, counts {cnt_g.mean()} vs {cnt_e.mean()}')

    # --- pallas DMA grid ball query ---
    from pdm_ssd_tpu.ops.pallas.retired.grid_query import grid_ball_query_pallas
    idx = np.asarray(jax.device_get(grid_ball_query_pallas(
        0.8, 16, xyz, cen, pc_range=(0., -40., 70.4, 40.))))
    d = np.linalg.norm(pts[0][idx[0]] - np.asarray(cen)[0][:, None, :], axis=-1)
    nonzero = (idx[0] != 0).any(axis=1)
    frac = within = (d[nonzero] < 0.8 + 1e-4).mean()
    cnt_p = np.array([len(set(r.tolist())) for r in idx[0][:512]])
    if frac > 0.999 and abs(cnt_p.mean() - cnt_e.mean()) < 0.1:
        print(f'PASS pallas grid query (DMA): within {frac:.4f}, '
              f'count {cnt_p.mean():.2f} vs exact {cnt_e.mean():.2f}')
    else:
        failures.append('grid_query_pallas')
        print(f'FAIL pallas grid query: within {frac}, counts {cnt_p.mean()} vs {cnt_e.mean()}')

    # --- one-hot gather ---
    src = jnp.asarray(rng.randn(2, 512, 64).astype(np.float32))
    gidx = jnp.asarray(rng.randint(0, 512, (2, 300)).astype(np.int32))
    got = np.asarray(jax.device_get(gather_rows(src, gidx)))
    want = np.stack([np.asarray(src)[b][np.asarray(gidx)[b]] for b in range(2)])
    err = np.abs(got - want).max()
    if err < 0.05:
        print(f'PASS onehot gather: max err {err:.4f} (bf16)')
    else:
        failures.append('gather')
        print(f'FAIL onehot gather: max err {err}')

    # --- one-hot scatter-add ---
    vals = jnp.asarray(rng.randn(2, 200, 16).astype(np.float32))
    sidx = jnp.asarray(rng.randint(0, 100, (2, 200)).astype(np.int32))
    got = np.asarray(jax.device_get(scatter_add_rows(vals, sidx, 100)))
    want = np.zeros((2, 100, 16), np.float32)
    for b in range(2):
        for r in range(200):
            want[b, sidx[b, r]] += np.asarray(vals)[b, r]
    err = np.abs(got - want).max()
    if err < 0.1:
        print(f'PASS onehot scatter-add: max err {err:.4f} (bf16)')
    else:
        failures.append('scatter')
        print(f'FAIL onehot scatter-add: max err {err}')

    if failures:
        print(f'\n{len(failures)} FAILURES: {failures}')
        sys.exit(1)
    print('\nall TPU kernel checks passed')


if __name__ == '__main__':
    main()
