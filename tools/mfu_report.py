"""MFU report (VERDICT r3 item 10): analytic model FLOPs (jaxpr walk,
`tools/flops_count.py`) / measured step time / measured MXU roofline.

The roofline denominator is the repo's MEASURED large-matmul rate on this
chip (43 TF/s bf16 at 4096^3, BENCH_NOTES "microbench" table) — an honest
upper bound for what any model graph could sustain here; nominal datasheet
peaks for the tunneled v5e aren't observable from this host.

Usage:  python tools/mfu_report.py [--flagship_ms 30.4 --flagship_B 8]
                                   [--sparse_fwd_ms 121.3 --sparse_train_ms
                                    263.0 --sparse_B 2]
Defaults are the round-4 measured numbers; pass fresh timings after a perf
round. Tracing runs on CPU — no TPU needed.
"""
import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tools'))

import numpy as np

PEAK_TFS = 43.0        # measured bf16 matmul roofline on this chip


def report(name, flops, ms, peak_tfs=PEAK_TFS):
    tfs = flops / (ms * 1e-3) / 1e12
    print(f'{name:34s} {flops/1e9:9.2f} GFLOP  {ms:7.1f} ms  '
          f'{tfs:6.2f} TF/s  MFU {100*tfs/peak_tfs:5.1f}%')
    return tfs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--flagship_ms', type=float, default=30.4)
    ap.add_argument('--flagship_B', type=int, default=8)
    ap.add_argument('--sparse_fwd_ms', type=float, default=121.3)
    ap.add_argument('--sparse_train_ms', type=float, default=263.0)
    ap.add_argument('--sparse_B', type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from flops_count import flops_of
    from pdm_ssd_tpu.utils.config import cfg_from_yaml_file, CfgNode
    from pdm_ssd_tpu.models import build_network, get_host_prepare

    # ---- flagship (point-exact pdm_ssd_point) predict
    from __graft_entry__ import _make_batch
    cfg = cfg_from_yaml_file(
        str(REPO / 'configs/kitti_models/pdm_ssd_point.yaml'), CfgNode())
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset_cfg=cfg.DATA_CONFIG)
    batch = _make_batch(B=args.flagship_B, N=16384)
    variables = jax.eval_shape(
        lambda: model.init({'params': jax.random.PRNGKey(0)},
                           {'points': jnp.zeros_like(batch['points'][:1])},
                           training=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    fl = flops_of(lambda p: model.apply(variables, {'points': p},
                                        method=model.predict),
                  batch['points'])
    report(f'flagship predict (B={args.flagship_B})', fl, args.flagship_ms)

    # ---- sparse SECOND at 0.05 m: fwd + full train step
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
    B, V = args.sparse_B, 16000
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
    gt[:, :, 0] = 30.0
    gt[:, :, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :, 7] = 1
    sbatch = {'voxels': vox, 'voxel_coords': coords,
              'voxel_num_points': nump, 'voxel_mask': vmask,
              'gt_boxes': gt, 'gt_mask': np.ones((B, 8), bool)}
    prepare = get_host_prepare(cfg.MODEL, cfg.DATA_CONFIG, training=True)
    sbatch = {k: jnp.asarray(v) for k, v in prepare(sbatch).items()}

    variables = jax.eval_shape(lambda: model.init(
        {'params': jax.random.PRNGKey(0)}, sbatch, training=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    fl_fwd = flops_of(lambda b: model.apply(variables, b, training=False),
                      sbatch)
    report(f'sparse SECOND fwd (B={B})', fl_fwd, args.sparse_fwd_ms)

    def train_loss(params, b):
        (l, _), _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            b, training=True, mutable=['batch_stats'],
            method=model.forward_with_loss)
        return l

    fl_train = flops_of(
        lambda p, b: jax.grad(train_loss)(p, b), variables['params'], sbatch)
    report(f'sparse SECOND fwd+bwd (B={B})', fl_train, args.sparse_train_ms)


if __name__ == '__main__':
    main()
