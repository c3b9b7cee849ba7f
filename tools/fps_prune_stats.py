"""Pruned-FPS feasibility statistics (VERDICT r3 item 6 / ROADMAP #2).

Exact grid-bucketed FPS skips a bucket's distance updates when the new
pick cannot improve any cached min-distance in it:

    lb(bucket, pick)^2 >= max_{i in bucket} d_cache[i]

This simulates that EXACT criterion on production-shape clouds (the
synthetic KITTI generator used by every sparse bench) and reports, per
FPS iteration, the fraction of buckets (and of points) that MUST be
updated — the upper bound on any correct pruning scheme's saving. The
numbers decide whether a Pallas recast (contiguous bucket ranges +
dynamic-slice updates + hierarchical block-max argmax) can beat the
flat kernel's ~1.2 us/iteration, whose cost is fixed vector-op latency
over a VMEM-resident cache, not memory traffic.

Run: python tools/fps_prune_stats.py [N] [M] [bucket_cells]
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tools'))

import numpy as np


def simulate(pts, M, n_buckets=128):
    """Exact FPS with bucket bookkeeping; returns per-iteration counts of
    buckets/points whose distance caches must be updated."""
    N = len(pts)
    # equal-count buckets along a Morton-ish sort (x-major) -> contiguous
    # ranges, the layout a Pallas kernel would use
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]
    bsz = (N + n_buckets - 1) // n_buckets
    bounds_lo = np.full((n_buckets, 3), np.inf)
    bounds_hi = np.full((n_buckets, 3), -np.inf)
    for b in range(n_buckets):
        seg = pts[b * bsz:(b + 1) * bsz]
        if len(seg):
            bounds_lo[b] = seg.min(0)
            bounds_hi[b] = seg.max(0)

    d = np.full(N, np.inf)
    cur = 0
    touched_buckets = np.zeros(M)
    touched_points = np.zeros(M)
    for it in range(M):
        p = pts[cur]
        # exact lower bound: squared distance from p to each bucket's bbox
        lo = np.maximum(bounds_lo - p, 0.0)
        hi = np.maximum(p - bounds_hi, 0.0)
        lb2 = (np.maximum(lo, hi) ** 2).sum(1)
        bmax = np.full(n_buckets, -np.inf)
        for b in range(n_buckets):
            seg = d[b * bsz:(b + 1) * bsz]
            if len(seg):
                bmax[b] = seg.max()
        need = lb2 < bmax
        touched_buckets[it] = need.sum()
        touched_points[it] = need.sum() * bsz
        # the actual update (all points — simulation only measures `need`)
        nd = ((pts - p) ** 2).sum(1)
        d = np.minimum(d, nd)
        cur = int(np.argmax(d))
    return touched_buckets, touched_points


def main():
    from bench_second_sparse import synth_cloud
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    rng = np.random.RandomState(0)
    cloud = synth_cloud(rng)[:, :3]
    sel = rng.choice(len(cloud), N, replace=False)
    pts = cloud[sel].astype(np.float64)
    tb, tp = simulate(pts, M, n_buckets)
    print(f'N={N} M={M} buckets={n_buckets} (size {N // n_buckets})')
    for lo, hi in [(0, 64), (64, 256), (256, 1024), (1024, M)]:
        hi = min(hi, M)
        if lo >= hi:
            continue
        fb = tb[lo:hi].mean() / n_buckets
        print(f'  iters [{lo:5d},{hi:5d}): buckets touched '
              f'{tb[lo:hi].mean():7.1f}/{n_buckets} = {100 * fb:5.1f}%')
    print(f'  mean over all {M} iters: {tb.mean():.1f}/{n_buckets} '
          f'= {100 * tb.mean() / n_buckets:.1f}% of buckets '
          f'({100 * tp.mean() / N:.1f}% of points)')


if __name__ == '__main__':
    main()
