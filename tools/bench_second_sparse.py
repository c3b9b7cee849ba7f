"""Sparse voxel ladder at the reference's NATIVE 0.05 m regime (VERDICT r2
item 1): SECOND with SparseVoxelBackBone8x on the 1408x1600x41 grid —
the configuration the dense ladder cannot hold in HBM.

Measures forward ms/batch and a full train step, with host kernel-map build
time reported separately (it overlaps with device compute in the real
pipeline's prefetch).
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def synth_cloud(rng, n=120000):
    """Lidar-like synthetic scene: ground plane + boxes + poles, front FOV."""
    n_g = int(n * 0.6)
    x = rng.uniform(0, 70.4, n_g)
    y = rng.uniform(-40, 40, n_g)
    ground = np.stack([x, y, -1.7 + rng.randn(n_g) * 0.03], -1)
    objs = []
    for _ in range(40):
        cx, cy = rng.uniform(5, 65), rng.uniform(-35, 35)
        w, l, h = rng.uniform(0.5, 2), rng.uniform(0.5, 5), rng.uniform(0.5, 2)
        m = (n - n_g) // 40
        objs.append(np.stack([
            cx + rng.uniform(-l / 2, l / 2, m),
            cy + rng.uniform(-w / 2, w / 2, m),
            -1.7 + rng.uniform(0, h, m)], -1))
    pts = np.concatenate([ground] + objs)
    keep = (np.abs(pts[:, 1]) < pts[:, 0] * 0.9 + 5)  # fov-ish
    pts = pts[keep]
    return np.concatenate([pts, rng.rand(len(pts), 1)], -1).astype(np.float32)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--xwin', action='store_true')
    ap.add_argument('--qwin', action='store_true',
                    help='quad-window gather (6C rows per 4-site group)')
    ap.add_argument('--pwin', action='store_true',
                    help='pair-window gather (4C rows per 2-site pair)')
    ap.add_argument('--barrier', type=int, default=-1,
                    help='-1: default (= xwin/qwin), 0/1: force off/on')
    ap.add_argument('--no_bwd', action='store_true')
    ap.add_argument('--bf16', action='store_true',
                    help='bf16 feature slot tables (TABLE_DTYPE)')
    ap.add_argument('--int8', action='store_true',
                    help='int8 feature slot tables (dynamic per-channel '
                         'quant, dequant folded into the matmul kernel)')
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--gbwd', type=int, default=1,
                    help='gather-transpose backward (sparse_conv_mm): '
                         '1 on (default), 0 XLA autodiff')
    ap.add_argument('--full_step', action='store_true',
                    help='bench the full fused train step (losses + Adam '
                         'update) instead of grad-only')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    jax.config.update('jax_default_matmul_precision', 'bfloat16')

    from pdm_ssd_tpu.utils.config import cfg_from_yaml_file, CfgNode
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from pdm_ssd_tpu.datasets.processor.data_processor import DataProcessor

    cfg = cfg_from_yaml_file(
        str(REPO / 'configs/kitti_models/second_sparse.yaml'), CfgNode())
    if args.xwin:
        cfg.MODEL.BACKBONE_3D.XWIN = True
    cfg.MODEL.BACKBONE_3D.QWIN = bool(args.qwin)
    cfg.MODEL.BACKBONE_3D.PWIN = bool(args.pwin)
    if args.qwin or args.pwin:
        cfg.MODEL.BACKBONE_3D.XWIN = False
    if args.barrier >= 0:
        cfg.MODEL.BACKBONE_3D.LAYER_BARRIER = bool(args.barrier)
    if args.bf16:
        cfg.MODEL.BACKBONE_3D.TABLE_DTYPE = 'bf16'
    if args.int8:
        cfg.MODEL.BACKBONE_3D.TABLE_DTYPE = 'int8'
    print(f'xwin={cfg.MODEL.BACKBONE_3D.get("XWIN", False)} '
          f'qwin={args.qwin} pwin={args.pwin} barrier={args.barrier} '
          f'bf16={args.bf16} int8={args.int8}', flush=True)
    model = build_network(cfg.MODEL, num_class=3, dataset_cfg=cfg.DATA_CONFIG,
                         class_names=cfg.CLASS_NAMES)
    proc = DataProcessor(cfg.DATA_CONFIG.DATA_PROCESSOR,
                         np.asarray(cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
                                    np.float32), training=True,
                         num_point_features=4)

    B, V = args.batch, 16000
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
        print(f'sample {b}: {nv} voxels', flush=True)
    gt = np.zeros((B, 8, 8), np.float32)
    gt[:, :, 0] = rng.uniform(5, 60, (B, 8))
    gt[:, :, 1] = rng.uniform(-30, 30, (B, 8))
    gt[:, :, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :, 7] = 1
    batch = {'voxels': vox, 'voxel_coords': coords,
             'voxel_num_points': nump, 'voxel_mask': vmask,
             'gt_boxes': gt, 'gt_mask': np.ones((B, 8), bool)}

    cfg.MODEL.BACKBONE_3D.GATHER_BWD = bool(args.gbwd)
    prepare = get_host_prepare(cfg.MODEL, cfg.DATA_CONFIG,
                               training=not args.no_bwd)
    t0 = time.perf_counter()
    batch = prepare(batch)
    t_maps = time.perf_counter() - t0
    print(f'host kernel-map build: {t_maps*1e3:.1f} ms/batch (B={B})',
          flush=True)
    for s in (1, 2, 3, 4):
        print(f'  stage{s}: {int(batch[f"sp_mask{s}"].sum())} active '
              f'(cap {batch[f"sp_mask{s}"].shape[1]})')
    print(f'  out: {int(batch["sp_mask_out"].sum())} active')
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

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
    print(f'SECOND sparse fwd (B={B}, grid 1408x1600x41): {fms:.1f} ms/batch '
          f'({B/fms*1e3:.1f} fps/chip)', flush=True)

    if args.no_bwd:
        return

    if args.full_step:
        from pdm_ssd_tpu.runtime.trainer import (create_train_state,
                                                 make_train_step)
        hostb = {k: np.asarray(v) for k, v in batch.items()}
        state, tx, _ = create_train_state(model, hostb, cfg.OPTIMIZATION,
                                          10, 10)
        tstep = make_train_step(model, tx)
        t0 = time.time()
        state, m = tstep(state, batch)
        np.asarray(jax.device_get(m['loss']))
        print(f'full-step compile {time.time()-t0:.0f}s', flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = tstep(state, batch)
        np.asarray(jax.device_get(m['loss']))
        sms = (time.perf_counter() - t0) / iters * 1e3
        print(f'SECOND sparse FULL train step (B={B}): {sms:.1f} ms/batch '
              f'= {B/sms*1e3:.2f} samples/s/chip', flush=True)
        return

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
    print(f'train-step compile {time.time()-t0:.0f}s', flush=True)
    t0 = time.perf_counter()
    gs = [step(variables['params'], batch) for _ in range(iters)]
    s = jax.jit(lambda xs: sum(jax.tree_util.tree_leaves(x)[0].ravel()[0]
                               for x in xs))(gs)
    np.asarray(jax.device_get(s))
    bms = (time.perf_counter() - t0) / iters * 1e3
    print(f'SECOND sparse fwd+bwd (B={B}): {bms:.1f} ms/batch', flush=True)


if __name__ == '__main__':
    main()
