"""Timing for the point-exact PDM-SSD (pdm_ssd_point.yaml) on the TPU.

Same methodology as bench.py: pipelined independent predict calls, one
blocking fetch (the tunnel has ~30 ms per-call round-trip latency that
pipelining hides).
"""
import json
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
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = cfg_from_yaml_file(str(REPO / cfgfile), CfgNode())
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset_cfg=cfg.DATA_CONFIG)
    batch = _make_batch(B=B, N=16384)

    t0 = time.time()
    init_fn = jax.jit(lambda pts: model.init(
        {'params': jax.random.PRNGKey(0)}, {'points': pts}, training=False))
    variables = init_fn(batch['points'][:1])
    print(f'init: {time.time()-t0:.1f}s')

    @jax.jit
    def predict(points):
        return model.apply(variables, {'points': points}, method=model.predict)

    pts = jax.device_put(batch['points'])
    t0 = time.time()
    out = predict(pts)
    jax.device_get(out['pred_scores'])
    print(f'compile+first: {time.time()-t0:.1f}s')

    iters = 20
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [predict(pts) for _ in range(iters)]
        jax.device_get(outs[-1]['pred_scores'])
        rates.append(B * iters / (time.perf_counter() - t0))
    fps = sorted(rates)[1]
    print(json.dumps({'cfg': cfgfile, 'batch': B, 'fps_per_chip': round(fps, 1),
                      'ms_per_batch': round(B / fps * 1e3, 1)}))


if __name__ == '__main__':
    main()
