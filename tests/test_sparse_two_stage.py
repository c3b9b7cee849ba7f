"""Two-stage models on the sparse 0.05 m ladder.

`SparseVoxelNeighborAgg` (slot-ID-grid voxel query, the reference's
`voxel_query_gpu.cu` + `voxel_pool_modules.py:8` analog) must agree with the
dense `VoxelNeighborAgg` exactly given the same weights — the dense module
is itself dense-conv-oracle-tested — and Voxel R-CNN / PV-RCNN must
assemble, train and predict end-to-end over `SparseVoxelBackBone8x`
(reference assemblies: `pcdet/models/detectors/{voxel_rcnn,pv_rcnn}.py`).
"""
import numpy as np
import jax
import jax.numpy as jnp

from pdm_ssd_tpu.models.backbones_3d.pfe import (VoxelNeighborAgg,
                                                 SparseVoxelNeighborAgg)


def make_sparse_scene(rng, dims, n, cap):
    D, H, W = dims
    flat = rng.choice(D * H * W, size=n, replace=False)
    flat.sort()
    coords = np.zeros((cap, 3), np.int32)
    coords[:n] = np.stack([flat // (H * W), (flat // W) % H, flat % W], -1)
    mask = np.arange(cap) < n
    return coords, mask


def test_sparse_voxel_agg_matches_dense(rng):
    dims = (5, 10, 12)
    D, H, W = dims
    B, n, cap, C = 2, 60, 80, 6
    vs = (0.2, 0.25, 0.3)
    pr = (0.0, -1.25, -0.75, 0.2 * W, 1.25, 0.75)
    stride = 1

    coords = np.zeros((B, cap, 3), np.int32)
    mask = np.zeros((B, cap), bool)
    feats = rng.randn(B, cap, C).astype(np.float32)
    for b in range(B):
        coords[b], mask[b] = make_sparse_scene(rng, dims, n, cap)
    feats[~mask] = 0

    vol = np.zeros((B, D, H, W, C), np.float32)
    occ = np.zeros((B, D, H, W), bool)
    for b in range(B):
        c = coords[b][mask[b]]
        vol[b, c[:, 0], c[:, 1], c[:, 2]] = feats[b][mask[b]]
        occ[b, c[:, 0], c[:, 1], c[:, 2]] = True

    K = 40
    kp = np.stack([
        rng.uniform(pr[0], pr[3], (B, K)),
        rng.uniform(pr[1], pr[4], (B, K)),
        rng.uniform(pr[2], pr[5], (B, K))], -1).astype(np.float32)

    mlp = [8, 16]
    dense_m = VoxelNeighborAgg(mlp=mlp, downsample=stride, voxel_size=vs,
                               pc_range=pr)
    sparse_m = SparseVoxelNeighborAgg(mlp=mlp, downsample=stride,
                                      voxel_size=vs, pc_range=pr, dims=dims)
    var = dense_m.init(jax.random.PRNGKey(0), jnp.asarray(vol),
                       jnp.asarray(occ), jnp.asarray(kp))
    ref = dense_m.apply(var, jnp.asarray(vol), jnp.asarray(occ),
                        jnp.asarray(kp))
    # identical param structure by construction (fc{i}/bn{i})
    got = sparse_m.apply(var, jnp.asarray(feats), jnp.asarray(coords),
                         jnp.asarray(mask), jnp.asarray(kp))
    assert np.isfinite(np.asarray(ref)).all()
    assert np.abs(np.asarray(ref)).max() > 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _fine_voxel_batch(rng, B=2):
    """Voxelize the zoo test batch at the fine test grid (matches the
    second-sparse assembly test's inline voxelization)."""
    from tests.test_detector3d_zoo import make_batch
    batch = make_batch(rng, B=B)
    V = 256
    coords = np.zeros((B, V, 3), np.int32)
    feats_pts = np.zeros((B, V, 5, 4), np.float32)
    nump = np.zeros((B, V), np.int32)
    vmask = np.zeros((B, V), bool)
    for b in range(B):
        pts = np.asarray(batch['points'][b])
        cell = np.floor((pts[:, :3] - [0, -16, -3])
                        / [0.5, 0.5, 4 / 24]).astype(int)
        ok = np.all((cell >= 0) & (cell < [64, 64, 24]), 1)
        pts, cell = pts[ok], cell[ok]
        flat = (cell[:, 2] * 64 + cell[:, 1]) * 64 + cell[:, 0]
        order = np.argsort(flat, kind='stable')
        pts, cell, flat = pts[order], cell[order], flat[order]
        _, starts, counts = np.unique(flat, return_index=True,
                                      return_counts=True)
        nv = min(len(starts), V)
        for i in range(nv):
            k = min(counts[i], 5)
            feats_pts[b, i, :k] = pts[starts[i]:starts[i] + k]
            nump[b, i] = k
        coords[b, :nv] = cell[starts[:nv]][:, ::-1]
        vmask[b, :nv] = True
    batch.update({'voxels': jnp.asarray(feats_pts),
                  'voxel_coords': jnp.asarray(coords),
                  'voxel_num_points': jnp.asarray(nump),
                  'voxel_mask': jnp.asarray(vmask)})
    return batch


def _sparsify(cfg):
    from pdm_ssd_tpu.utils.config import CfgNode
    cfg.BACKBONE_3D = CfgNode({'NAME': 'SparseVoxelBackBone8x',
                               'NUM_FILTERS': [4, 8, 8, 8],
                               'OUT_FEATURES': 8})
    cfg.pop('MAP_TO_BEV', None)
    cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE = 8
    return cfg


def _run_assembly(rng, cfg):
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from tests.test_sparse_backbone import ds_cfg_fine
    ds = ds_cfg_fine()
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = _fine_voxel_batch(rng)
    prepare = get_host_prepare(cfg, ds)
    assert prepare is not None
    batch = prepare({k: np.asarray(v) for k, v in batch.items()})
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)},
                           batch, training=False)
    # the assembly must actually run the sparse ladder (VoxelRCNN/PVRCNN
    # used to hardcode the dense backbone, silently ignoring NAME)
    out = model.apply(variables, batch, training=False)
    assert 'multi_scale_3d_features_sparse' in out
    assert 'multi_scale_3d_features' not in out
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(2)},
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert any('rcnn' in k for k in tb)

    def loss_fn(p):
        (l, _), _ = model.apply({'params': p,
                                 'batch_stats': variables['batch_stats']},
                                batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(3)},
                                method=model.forward_with_loss)
        return l
    g = jax.grad(loss_fn)(variables['params'])
    total = sum(np.abs(np.asarray(v)).sum()
                for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[0] == 2
    assert dets['pred_boxes'].shape[2] == 7


def test_voxel_rcnn_on_sparse_ladder(rng):
    from tests.test_detector3d_zoo import voxelrcnn_cfg
    _run_assembly(rng, _sparsify(voxelrcnn_cfg()))


def test_pv_rcnn_on_sparse_ladder(rng):
    from tests.test_detector3d_zoo import pvrcnn_cfg
    _run_assembly(rng, _sparsify(pvrcnn_cfg()))


def test_pv_rcnn_plusplus_on_sparse_ladder(rng):
    """PV-RCNN++ (proposal-first keypoints + VectorPool raw-point agg)
    assembles over the sparse ladder via the same NAME dispatch."""
    from tests.test_detector3d_zoo import pvrcnn_cfg
    from pdm_ssd_tpu.utils.config import CfgNode
    cfg = pvrcnn_cfg()
    cfg.NAME = 'PVRCNNPlusPlus'
    cfg.PFE.SAMPLE_METHOD = 'SPC'
    cfg.PFE.SPC_SAMPLING = CfgNode({'SAMPLE_RADIUS_WITH_ROI': 4.0})
    cfg.PFE.SA_LAYER.raw_points.AGGREGATION = 'VectorPoolAgg'
    cfg.PFE.SA_LAYER.raw_points.LOCAL_GRID = 2
    _run_assembly(rng, _sparsify(cfg))
