"""Per-stage timing of the point-exact PDM-SSD on the TPU.

Times cumulative prefixes of the pipeline (backbone -> +point_head -> +neck ->
+bev -> +head -> +post) with pipelined calls; differences give per-stage cost.
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    jax.config.update('jax_default_matmul_precision', 'bfloat16')

    from __graft_entry__ import _make_batch
    from pdm_ssd_tpu.utils.config import cfg_from_yaml_file, CfgNode
    from pdm_ssd_tpu.models import build_network

    cfgfile = sys.argv[1] if len(sys.argv) > 1 else 'configs/kitti_models/pdm_ssd_point.yaml'
    B = 8
    cfg = cfg_from_yaml_file(str(REPO / cfgfile), CfgNode())
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset_cfg=cfg.DATA_CONFIG)
    batch = _make_batch(B=B, N=16384)

    t0 = time.time()
    init_fn = jax.jit(lambda pts: model.init(
        {'params': jax.random.PRNGKey(0)}, {'points': pts}, training=False))
    variables = init_fn(batch['points'][:1])
    print(f'init: {time.time()-t0:.1f}s', flush=True)

    def stage_fn(upto):
        def fn(m, points):
            b = {'points': points}
            b = m.backbone_3d(b, training=False)
            if upto >= 1 and m.point_head is not None:
                b = m.point_head(b, training=False)
            if upto >= 2 and m.pdm_neck is not None:
                b = m.pdm_neck(b, training=False)
            if upto >= 3 and m.backbone_2d is not None:
                b = m.backbone_2d(b, training=False)
            if upto >= 4 and m.dense_head is not None:
                b = m.dense_head(b, training=False)
            if upto >= 5:
                return m.post_process(b)
            return b
        return fn

    pts = jax.device_put(batch['points'])
    names = ['backbone_3d', '+point_head', '+pdm_neck', '+backbone_2d',
             '+dense_head', '+post_process']
    prev = 0.0
    for upto, name in enumerate(names):
        f = jax.jit(lambda p, u=upto: model.apply(variables, p, method=stage_fn(u)))
        t0 = time.time()
        out = f(pts)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        compile_s = time.time() - t0
        import jax.numpy as jnp
        sum_fn = jax.jit(lambda xs: sum(jnp.asarray(x, jnp.float32) for x in xs))
        iters = 10
        t0 = time.perf_counter()
        outs = [f(pts) for _ in range(iters)]
        leaves = [jax.tree_util.tree_leaves(o)[0].ravel()[0] for o in outs]
        np.asarray(jax.device_get(sum_fn(leaves)))  # one blocking fetch
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f'{name:16s} cum={ms:8.1f} ms  delta={ms-prev:8.1f} ms  (compile {compile_s:.0f}s)',
              flush=True)
        prev = ms


if __name__ == '__main__':
    main()
