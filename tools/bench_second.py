"""VERDICT r1 item 8: dense voxel ladder at SECOND-scale grids, measured.

Runs the DenseVoxelBackBone8x forward (and a full SECOND train step) at the
second.yaml grid (0.1 m voxels -> 704x800x20) and reports ms/batch; prints
the arithmetic for the reference's native 0.05 m grid (1408x1600x40), which
does not fit densely — the measured decision VERDICT asked for.
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    jax.config.update('jax_default_matmul_precision', 'bfloat16')

    from pdm_ssd_tpu.utils.config import cfg_from_yaml_file, CfgNode
    from pdm_ssd_tpu.models import build_network

    cfg = cfg_from_yaml_file(str(REPO / 'configs/kitti_models/second.yaml'),
                             CfgNode())
    model = build_network(cfg.MODEL, num_class=3, dataset_cfg=cfg.DATA_CONFIG,
                          class_names=cfg.CLASS_NAMES)

    B, V = 2, 16000
    rng = np.random.RandomState(0)
    vox = rng.rand(B, V, 5, 4).astype(np.float32)
    coords = np.stack([rng.randint(0, 20, (B, V)), rng.randint(0, 800, (B, V)),
                       rng.randint(0, 704, (B, V))], -1).astype(np.int32)
    nump = rng.randint(1, 6, (B, V)).astype(np.int32)
    gt = np.zeros((B, 8, 8), np.float32)
    gt[:, :, 0] = rng.uniform(5, 60, (B, 8))
    gt[:, :, 1] = rng.uniform(-30, 30, (B, 8))
    gt[:, :, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :, 7] = 1
    batch = {'voxels': jnp.asarray(vox), 'voxel_coords': jnp.asarray(coords),
             'voxel_num_points': jnp.asarray(nump),
             'voxel_mask': jnp.asarray(nump > 0),
             'gt_boxes': jnp.asarray(gt), 'gt_mask': jnp.ones((B, 8), bool)}

    init = jax.jit(lambda: model.init(
        {'params': jax.random.PRNGKey(0)}, batch, training=False))
    t0 = time.time()
    variables = init()
    print(f'init {time.time()-t0:.0f}s', flush=True)

    fwd = jax.jit(lambda b: model.apply(variables, b, training=False)[
        'spatial_features_2d'])
    t0 = time.time()
    out = fwd(batch)
    np.asarray(jax.device_get(out.ravel()[0]))
    print(f'fwd compile {time.time()-t0:.0f}s', flush=True)
    iters = 10
    t0 = time.perf_counter()
    outs = [fwd(batch) for _ in range(iters)]
    s = jax.jit(lambda xs: sum(x.ravel()[0] for x in xs))(outs)
    np.asarray(jax.device_get(s))
    fms = (time.perf_counter() - t0) / iters * 1e3
    print(f'SECOND dense fwd (B={B}, grid 704x800x20): {fms:.1f} ms/batch '
          f'({B/fms*1e3:.1f} fps)', flush=True)

    def loss_fn(params, b):
        (l, _), _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            b, training=True, mutable=['batch_stats'],
            method=model.forward_with_loss)
        return l

    step = jax.jit(jax.grad(loss_fn))
    t0 = time.time()
    g = step(variables['params'], batch)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(g)[0].ravel()[0]))
    print(f'grad compile {time.time()-t0:.0f}s', flush=True)
    t0 = time.perf_counter()
    gs = [step(variables['params'], batch) for _ in range(5)]
    s = jax.jit(lambda xs: sum(jax.tree_util.tree_leaves(x)[0].ravel()[0]
                               for x in xs))(gs)
    np.asarray(jax.device_get(s))
    gms = (time.perf_counter() - t0) / 5 * 1e3
    print(f'SECOND dense fwd+bwd: {gms:.1f} ms/batch', flush=True)

    print('\nreference native grid (0.05 m -> 1408x1600x40):')
    c = 16
    bytes_stage1 = 1408 * 1600 * 40 * c * 4
    print(f'  stage-1 activation alone = {bytes_stage1/2**30:.1f} GiB/sample '
          '(f32) -> does not fit 16 GiB HBM densely even at batch 1 with '
          'backward; the dense ladder runs the 0.1 m grid instead (above), '
          'and mAP-relevant capacity is recovered by channel width, not '
          'cell size.')


if __name__ == '__main__':
    main()
