"""Production-shape run through the SHARDED train/predict path on the real
chip (VERDICT r3 weak-5 / item 7): build the `parallel/mesh.py` mesh over
the available devices (1-device on the tunneled TPU — same pjit/sharding
code path the 8-device CPU tests exercise at toy shapes), replicate state,
shard batches on the data axis, and time the flagship predict + fused train
step and the sparse SECOND fused train step at production shapes.

Done-criterion: sharded timings within noise of the plain-jit benches
(bench.py / bench_second_sparse.py) — the sharded graph compiles and
performs at scale, closing the toy-shape gap of the multichip dryrun.
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tools'))

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    jax.config.update('jax_default_matmul_precision', 'bfloat16')
    import jax.numpy as jnp

    from pdm_ssd_tpu.utils.config import cfg_from_yaml_file, CfgNode
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from pdm_ssd_tpu.parallel import make_mesh, replicate, shard_batch
    from pdm_ssd_tpu.runtime.trainer import (create_train_state,
                                             make_train_step,
                                             _filter_device_batch)

    mesh = make_mesh()
    print(f'mesh: {mesh.shape} over {jax.devices()}', flush=True)

    # ---- flagship (point-exact) predict + train step, B=8 x 16384 pts
    from __graft_entry__ import _make_batch
    cfg = cfg_from_yaml_file(
        str(REPO / 'configs/kitti_models/pdm_ssd_point.yaml'), CfgNode())
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset_cfg=cfg.DATA_CONFIG)
    batch = _make_batch(B=8, N=16384)
    hostb = {k: np.asarray(v) for k, v in batch.items()}
    state, tx, _ = create_train_state(model, hostb, cfg.OPTIMIZATION, 10, 10)
    state = replicate(state, mesh)
    tstep = make_train_step(model, tx)
    dbatch = shard_batch(_filter_device_batch(hostb), mesh)

    t0 = time.time()
    state, m = tstep(state, dbatch)
    jax.device_get(m['loss'])
    print(f'flagship sharded train compile {time.time()-t0:.0f}s', flush=True)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = tstep(state, dbatch)
    jax.device_get(m['loss'])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f'flagship SHARDED train step (B=8): {ms:.1f} ms '
          f'= {8 / ms * 1e3:.1f} samples/s/chip', flush=True)

    variables = {'params': jax.device_get(state.params),
                 'batch_stats': jax.device_get(state.batch_stats)}
    variables = replicate(variables, mesh)
    predict = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))
    pb = shard_batch({'points': hostb['points']}, mesh)
    out = predict(variables, pb)
    jax.device_get(out['pred_scores'])
    t0 = time.perf_counter()
    outs = [predict(variables, pb) for _ in range(iters)]
    jax.device_get(outs[-1]['pred_scores'])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f'flagship SHARDED predict (B=8): {ms:.1f} ms '
          f'= {8 / ms * 1e3:.1f} fps/chip', flush=True)

    # ---- sparse SECOND full train step, B=2, 0.05 m production shapes
    from bench_second_sparse import synth_cloud
    from pdm_ssd_tpu.datasets.processor.data_processor import DataProcessor
    cfg = cfg_from_yaml_file(
        str(REPO / 'configs/kitti_models/second_sparse.yaml'), CfgNode())
    cfg.MODEL.BACKBONE_3D.XWIN = True
    cfg.MODEL.BACKBONE_3D.TABLE_DTYPE = 'bf16'
    model = build_network(cfg.MODEL, num_class=3, dataset_cfg=cfg.DATA_CONFIG,
                          class_names=cfg.CLASS_NAMES)
    proc = DataProcessor(cfg.DATA_CONFIG.DATA_PROCESSOR,
                         np.asarray(cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
                                    np.float32), training=True,
                         num_point_features=4)
    B, V = 2, 16000
    rng = np.random.RandomState(0)
    vox = np.zeros((B, V, 5, 4), np.float32)
    coords = np.zeros((B, V, 3), np.int32)
    nump = np.zeros((B, V), np.int32)
    vmask = np.zeros((B, V), bool)
    for b in range(B):
        dd = proc.forward({'points': synth_cloud(rng)})
        nv = min(len(dd['voxels']), V)
        vox[b, :nv] = dd['voxels'][:nv]
        coords[b, :nv] = dd['voxel_coords'][:nv]
        nump[b, :nv] = dd['voxel_num_points'][:nv]
        vmask[b, :nv] = True
    gt = np.zeros((B, 8, 8), np.float32)
    gt[:, :, 0] = rng.uniform(5, 60, (B, 8))
    gt[:, :, 1] = rng.uniform(-30, 30, (B, 8))
    gt[:, :, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :, 7] = 1
    sbatch = {'voxels': vox, 'voxel_coords': coords, 'voxel_num_points': nump,
              'voxel_mask': vmask, 'gt_boxes': gt,
              'gt_mask': np.ones((B, 8), bool)}
    prepare = get_host_prepare(cfg.MODEL, cfg.DATA_CONFIG, training=True)
    sbatch = prepare(sbatch)
    state, tx, _ = create_train_state(model, sbatch, cfg.OPTIMIZATION, 10, 10)
    state = replicate(state, mesh)
    tstep = make_train_step(model, tx)
    dbatch = shard_batch(_filter_device_batch(sbatch), mesh)
    t0 = time.time()
    state, m = tstep(state, dbatch)
    jax.device_get(m['loss'])
    print(f'sparse sharded train compile {time.time()-t0:.0f}s', flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = tstep(state, dbatch)
    jax.device_get(m['loss'])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f'sparse SECOND SHARDED train step (B=2): {ms:.1f} ms '
          f'= {2 / ms * 1e3:.2f} samples/s/chip', flush=True)


if __name__ == '__main__':
    main()
