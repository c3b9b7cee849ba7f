"""Detector-zoo throughput on the TPU (VERDICT r2 weak-1 / r3 item 1): one
jitted `predict` (default) or FULL fused train step (`--train`: forward +
target assignment + losses + backward + Adam-OneCycle update) per config on
synthetic production-shape batches, pipelined timing (bench.py
methodology). Prints one JSON line per model.

Usage: python tools/bench_zoo.py [--train] [cfg ...] (default: standard set)
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

DEFAULT = [
    ('configs/kitti_models/pointpillar.yaml', 4),
    ('configs/kitti_models/second.yaml', 2),
    ('configs/kitti_models/second_sparse.yaml', 2),
    ('configs/kitti_models/centerpoint_pillar.yaml', 4),
    ('configs/kitti_models/voxel_rcnn.yaml', 2),
    ('configs/kitti_models/voxel_rcnn_sparse.yaml', 2),
    ('configs/kitti_models/pv_rcnn_sparse.yaml', 2),
    ('configs/kitti_models/parta2_sparse.yaml', 2),
    ('configs/kitti_models/voxelnext.yaml', 2),
]


def synth_gt(rng, B, n=8):
    gt = np.zeros((B, n, 8), np.float32)
    gt[:, :, 0] = rng.uniform(5, 60, (B, n))
    gt[:, :, 1] = rng.uniform(-30, 30, (B, n))
    gt[:, :, 2] = -1.0
    gt[:, :, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :, 6] = rng.uniform(-np.pi, np.pi, (B, n))
    gt[:, :, 7] = rng.randint(1, 4, (B, n))
    return gt


def build_batch(cfg, B, training=False):
    """Synthetic clouds -> the config's full host pipeline (voxelize +
    kernel maps) or raw padded points for point models."""
    from bench_second_sparse import synth_cloud
    from pdm_ssd_tpu.datasets.processor.data_processor import DataProcessor
    from pdm_ssd_tpu.models import get_host_prepare

    rng = np.random.RandomState(0)
    procs = cfg.DATA_CONFIG.DATA_PROCESSOR
    has_voxels = any(p.NAME == 'transform_points_to_voxels' for p in procs)
    if not has_voxels:
        N = 16384
        pts = np.zeros((B, N, 4), np.float32)
        for b in range(B):
            c = synth_cloud(rng)[:N]
            pts[b, :len(c)] = c
        out = {'points': pts, 'batch_size': B}
        if training:
            out['gt_boxes'] = synth_gt(rng, B)
            out['gt_mask'] = np.ones((B, 8), bool)
        return out
    proc = DataProcessor(procs,
                         np.asarray(cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
                                    np.float32), training=False,
                         num_point_features=4)
    V = proc.max_num_voxels or 16000
    spec = next(p for p in procs if p.NAME == 'transform_points_to_voxels')
    npmax = spec.MAX_POINTS_PER_VOXEL
    vox = np.zeros((B, V, npmax, 4), np.float32)
    coords = np.zeros((B, V, 3), np.int32)
    nump = np.zeros((B, V), np.int32)
    vmask = np.zeros((B, V), bool)
    N = 16384
    pts = np.zeros((B, N, 4), np.float32)
    for b in range(B):
        cloud = synth_cloud(rng)
        pts[b, :min(N, len(cloud))] = cloud[:N]
        dd = proc.forward({'points': cloud})
        nv = min(len(dd['voxels']), V)
        vox[b, :nv] = dd['voxels'][:nv]
        coords[b, :nv] = dd['voxel_coords'][:nv]
        nump[b, :nv] = dd['voxel_num_points'][:nv]
        vmask[b, :nv] = True
    # raw points ride along for VSA-bearing models (PV-RCNN family)
    batch = {'voxels': vox, 'voxel_coords': coords, 'voxel_num_points': nump,
             'voxel_mask': vmask, 'points': pts, 'batch_size': B}
    if training:
        batch['gt_boxes'] = synth_gt(rng, B)
        batch['gt_mask'] = np.ones((B, 8), bool)
    prepare = get_host_prepare(cfg.MODEL, cfg.DATA_CONFIG, training=training)
    if prepare is not None:
        batch = prepare(batch)
    batch.pop('batch_size', None)
    return batch


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    jax.config.update('jax_default_matmul_precision', 'bfloat16')
    import jax.numpy as jnp

    from pdm_ssd_tpu.utils.config import cfg_from_yaml_file, CfgNode
    from pdm_ssd_tpu.models import build_network

    argv = [a for a in sys.argv[1:] if a != '--train']
    train = '--train' in sys.argv[1:]
    targets = [(c, 2) for c in argv] or DEFAULT
    for cfgfile, B in targets:
        try:
            cfg = cfg_from_yaml_file(str(REPO / cfgfile), CfgNode())
            model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                                  dataset_cfg=cfg.DATA_CONFIG,
                                  class_names=cfg.CLASS_NAMES)
            batch = build_batch(cfg, B, training=train)
            hostb = dict(batch)
            batch = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
                     for k, v in batch.items()}
            if train:
                from pdm_ssd_tpu.runtime.trainer import (create_train_state,
                                                         make_train_step)
                from pdm_ssd_tpu.runtime.trainer import _filter_device_batch
                t0 = time.time()
                state, tx, _ = create_train_state(
                    model, hostb, cfg.OPTIMIZATION, 10, 10)
                tstep = make_train_step(model, tx)
                dbatch = _filter_device_batch(batch)
                state, m = tstep(state, dbatch)
                jax.device_get(m['loss'])
                compile_s = time.time() - t0
                iters = 10
                rates = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        state, m = tstep(state, dbatch)
                    jax.device_get(m['loss'])
                    rates.append(B * iters / (time.perf_counter() - t0))
                sps = sorted(rates)[1]
                print(json.dumps({
                    'cfg': Path(cfgfile).stem, 'batch': B, 'mode': 'train',
                    'samples_per_sec_per_chip': round(sps, 2),
                    'ms_per_step': round(B / sps * 1e3, 1),
                    'compile_s': round(compile_s, 0)}), flush=True)
                continue
            t0 = time.time()
            variables = jax.jit(lambda: model.init(
                {'params': jax.random.PRNGKey(0)}, batch, training=False))()
            predict = jax.jit(lambda b: model.apply(
                variables, b, method=model.predict))
            out = predict(batch)
            jax.device_get(out['pred_scores'])
            compile_s = time.time() - t0
            iters = 10
            rates = []
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [predict(batch) for _ in range(iters)]
                jax.device_get(outs[-1]['pred_scores'])
                rates.append(B * iters / (time.perf_counter() - t0))
            fps = sorted(rates)[1]
            print(json.dumps({
                'cfg': Path(cfgfile).stem, 'batch': B,
                'fps_per_chip': round(fps, 1),
                'ms_per_batch': round(B / fps * 1e3, 1),
                'compile_s': round(compile_s, 0)}), flush=True)
        except Exception as e:  # keep the sweep going
            print(json.dumps({'cfg': Path(cfgfile).stem,
                              'error': f'{type(e).__name__}: {e}'[:200]}),
                  flush=True)


if __name__ == '__main__':
    main()
