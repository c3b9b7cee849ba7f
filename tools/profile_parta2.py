"""Part-A2 sparse per-stage profile (VERDICT r3 item 8): split the ~300 ms
B=2 predict into components by timing standalone subgraphs at the exact
production shapes (fresh params — timing is shape-determined):

  * SparseUNetV2 backbone (encoder + UR decoder)
  * SparseVoxelBackBone8x with the same caps (= the encoder ladder alone)
  * BaseBEVBackbone + anchor head convs on the stride-8 canvas
  * remainder = part head + roiaware pooling + ROI refine + NMS

Usage: python tools/profile_parta2.py
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tools'))

import numpy as np


def timeit(fn, *args, iters=10, fetch=None):
    import jax
    out = fn(*args)
    jax.device_get(fetch(out) if fetch else jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(fetch(out) if fetch else jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    jax.config.update('jax_default_matmul_precision', 'bfloat16')
    import jax.numpy as jnp

    from pdm_ssd_tpu.utils.config import cfg_from_yaml_file, CfgNode
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from pdm_ssd_tpu.models.backbones_3d.sparse_backbone import (
        SparseUNetV2, SparseVoxelBackBone8x)
    from bench_second_sparse import synth_cloud
    from pdm_ssd_tpu.datasets.processor.data_processor import DataProcessor

    cfg = cfg_from_yaml_file(
        str(REPO / 'configs/kitti_models/parta2_sparse.yaml'), CfgNode())
    model = build_network(cfg.MODEL, num_class=3, dataset_cfg=cfg.DATA_CONFIG,
                          class_names=cfg.CLASS_NAMES)
    proc = DataProcessor(cfg.DATA_CONFIG.DATA_PROCESSOR,
                         np.asarray(cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
                                    np.float32), training=False,
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
    batch = {'voxels': vox, 'voxel_coords': coords, 'voxel_num_points': nump,
             'voxel_mask': vmask}
    prepare = get_host_prepare(cfg.MODEL, cfg.DATA_CONFIG)
    batch = {k: jnp.asarray(v) for k, v in prepare(batch).items()}

    variables = jax.jit(lambda: model.init(
        {'params': jax.random.PRNGKey(0)}, batch, training=False))()
    full_ms = timeit(jax.jit(lambda b: model.apply(
        variables, b, method=model.predict)), batch,
        fetch=lambda o: o['pred_scores'])
    print(f'full Part-A2 predict: {full_ms:.1f} ms/batch (B={B})', flush=True)

    grid, _ = __import__(
        'pdm_ssd_tpu.models.detectors.detector3d',
        fromlist=['_grid_info'])._grid_info(cfg.DATA_CONFIG)
    # voxel_features for the standalone backbones (MeanVFE output shape)
    vfeat = jnp.asarray(
        vox.sum(2) / np.maximum(nump[..., None], 1), jnp.float32)
    bb_batch = dict(batch)
    bb_batch['voxel_features'] = vfeat

    for name, cls in (('SparseUNetV2 (enc+dec)', SparseUNetV2),
                      ('SparseVoxelBackBone8x (encoder only)',
                       SparseVoxelBackBone8x)):
        bb = cls(model_cfg=cfg.MODEL.BACKBONE_3D, input_channels=4,
                 grid_size=grid)
        bvars = jax.jit(lambda bb=bb: bb.init(
            {'params': jax.random.PRNGKey(0)}, dict(bb_batch),
            training=False))()
        # fetch scalars only (a 72 MB canvas fetch over the tunnel would
        # dominate); sum point_features too so the UNet decoder is not DCEd
        f = jax.jit(lambda b, bb=bb, bv=bvars: (lambda o:
            jnp.sum(o['spatial_features'][0, 0, 0]) +
            (jnp.sum(o['point_features'][0, 0]) if 'point_features' in o
             else 0.0))(bb.apply(bv, dict(b), training=False)))
        ms = timeit(f, bb_batch)
        print(f'{name}: {ms:.1f} ms/batch', flush=True)

    # BEV backbone + head convs on the stride-8 canvas
    from pdm_ssd_tpu.models.backbones_2d.base_bev_backbone import (
        BaseBEVBackbone)
    Dz, Hy, Wx = __import__(
        'pdm_ssd_tpu.ops.sparse_maps',
        fromlist=['ladder_shapes']).ladder_shapes(grid)[4]
    canvas = jnp.zeros((B, Hy, Wx, Dz * 128), jnp.float32)
    bev = BaseBEVBackbone(model_cfg=cfg.MODEL.BACKBONE_2D,
                          input_channels=Dz * 128)
    bvars = jax.jit(lambda: bev.init(
        {'params': jax.random.PRNGKey(0)},
        {'spatial_features': canvas}, training=False))()
    f = jax.jit(lambda c: jnp.sum(bev.apply(
        bvars, {'spatial_features': c},
        training=False)['spatial_features_2d'][0, 0, 0]))
    ms = timeit(f, canvas)
    print(f'BaseBEVBackbone ({Hy}x{Wx}x{Dz * 128}): {ms:.1f} ms/batch',
          flush=True)


if __name__ == '__main__':
    main()
