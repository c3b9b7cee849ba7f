"""Post-processing bottleneck hunt: scan overhead, NMS, top_k on the TPU."""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))


def timeit(name, fn, *args, n=5):
    f = jax.jit(fn)
    _fetch(f(*args))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(n)]
        s = jax.jit(lambda xs: sum(jnp.asarray(x, jnp.float32).ravel()[0] for x in xs))(
            [jax.tree_util.tree_leaves(o)[0] for o in outs])
        _fetch(s)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    print(f'{name}: {best:.2f} ms', flush=True)


def main():
    key = jax.random.PRNGKey(0)

    # 1. trivial scan: 512 iterations of a scalar op
    def scan512(x):
        def body(c, _):
            return c * 1.000001 + 1e-9, None
        c, _ = jax.lax.scan(body, x, None, length=512)
        return c
    timeit('scan 512 trivial iters', scan512, jnp.float32(1.0))

    def fori512(x):
        return jax.lax.fori_loop(0, 512, lambda i, c: c * 1.000001 + 1e-9, x)
    timeit('fori_loop 512 trivial iters', fori512, jnp.float32(1.0))

    # 2. nms_bev at point-config shape
    from pdm_ssd_tpu.ops import iou3d
    rng = np.random.RandomState(0)
    n = 356  # 100 hm + 256 vote
    boxes = np.concatenate([rng.uniform(0, 60, (8, n, 2)), np.full((8, n, 1), -1.0),
                            np.tile([3.9, 1.6, 1.56], (8, n, 1)),
                            rng.uniform(-3, 3, (8, n, 1))], -1).astype(np.float32)
    scores = rng.rand(8, n).astype(np.float32)
    valid = np.ones((8, n), bool)

    def nms(b, s, v):
        def per(b1, s1, v1):
            idx, keep = iou3d.nms_bev(b1, s1, 0.1, pre_maxsize=512,
                                      post_maxsize=100, valid=v1)
            return idx, keep
        return jax.vmap(per)(b, s, v)
    timeit('nms_bev B=8 n=356 pre=512 post=100', nms,
           jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))

    def cnms(b, s, v):
        def per(b1, s1, v1):
            return iou3d.circle_nms(b1, s1, 0.8, pre_maxsize=256,
                                    post_maxsize=100, valid=v1)
        return jax.vmap(per)(b, s, v)
    timeit('circle_nms B=8 n=356 pre=256 post=100', cnms,
           jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))

    # 3. top_k over (8, 4096) K=256 (vote branch)
    s = jax.random.uniform(key, (8, 4096))
    timeit('lax.top_k (8,4096) K=256', lambda x: jax.lax.top_k(x, 256)[0], s)

    from pdm_ssd_tpu.ops.selection import two_stage_topk
    timeit('two_stage_topk (8,4096) K=256', lambda x: two_stage_topk(x, 256)[0], s)

    # 4. score calibration d2 (B, 100, 4096)
    pts = jax.random.uniform(key, (8, 4096, 3)) * 70
    hb = jax.random.uniform(key, (8, 100, 2)) * 70

    def calib(hb, pts):
        d2 = jnp.sum((hb[:, :, None, :] - pts[:, None, :, :2]) ** 2, -1)
        return jnp.max(jnp.where(d2 < 1.0, 0.5, 0.0), -1)
    timeit('calibration d2 (8,100,4096)', calib, hb, pts)


if __name__ == '__main__':
    main()
