"""VoxelNeXt sparse head (VERDICT r2 item 7): slot-table heatmap targets,
sparse losses, slot decode, and the full sparse assembly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.models import build_network, get_host_prepare
from pdm_ssd_tpu.ops import sparse_maps as sm


def ds_cfg():
    return CfgNode({
        'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
        'NUM_POINT_FEATURES': 4,
        'DATA_PROCESSOR': [
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.5, 0.5, 0.16666667],
             'MAX_POINTS_PER_VOXEL': 5,
             'MAX_NUMBER_OF_VOXELS': {'train': 256, 'test': 256}}],
    })


def model_cfg():
    return CfgNode({
        'NAME': 'VoxelNeXt',
        'VFE': {'NAME': 'MeanVFE'},
        'BACKBONE_3D': {'NAME': 'SparseVoxelBackBone8x',
                        'NUM_FILTERS': [4, 8, 8, 8], 'OUT_FEATURES': 8},
        'DENSE_HEAD': {
            'NAME': 'VoxelNeXtHead', 'CLASS_AGNOSTIC': False,
            'CLASS_NAMES_EACH_HEAD': [['Car', 'Pedestrian', 'Cyclist']],
            'SHARED_CONV_CHANNEL': 8, 'NUM_HM_CONV': 2,
            'SEPARATE_HEAD_CFG': {
                'HEAD_ORDER': ['center', 'center_z', 'dim', 'rot'],
                'HEAD_DICT': {
                    'center': {'out_channels': 2, 'num_conv': 2},
                    'center_z': {'out_channels': 1, 'num_conv': 2},
                    'dim': {'out_channels': 3, 'num_conv': 2},
                    'rot': {'out_channels': 2, 'num_conv': 2}}},
            'TARGET_ASSIGNER_CONFIG': {'FEATURE_MAP_STRIDE': 8,
                                       'NUM_MAX_OBJS': 8,
                                       'GAUSSIAN_OVERLAP': 0.1,
                                       'MIN_RADIUS': 2},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0,
                'code_weights': [1.0] * 8}},
            'POST_PROCESSING': {'SCORE_THRESH': 0.05,
                                'POST_CENTER_LIMIT_RANGE':
                                    [0, -16, -3, 32, 16, 1],
                                'MAX_OBJ_PER_SAMPLE': 16}},
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.05,
            'NMS_CONFIG': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.1,
                           'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16}},
    })


def make_sparse_batch(rng, B=2):
    import sys
    sys.path.insert(0, 'tests')
    from test_detector3d_zoo import make_batch
    batch = make_batch(rng)
    V = 256
    coords = np.zeros((B, V, 3), np.int32)
    feats_pts = np.zeros((B, V, 5, 4), np.float32)
    nump = np.zeros((B, V), np.int32)
    vmask = np.zeros((B, V), bool)
    for b in range(B):
        pts = np.asarray(batch['points'][b])
        cell = np.floor((pts[:, :3] - [0, -16, -3]) / [0.5, 0.5, 4 / 24]
                        ).astype(int)
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
    batch.update({'voxels': feats_pts, 'voxel_coords': coords,
                  'voxel_num_points': nump, 'voxel_mask': vmask})
    return {k: np.asarray(v) for k, v in batch.items()}


def test_bev_maps_brute(rng):
    cap = 64
    co = np.zeros((cap, 3), np.int32)
    n = 40
    zz = rng.randint(0, 2, n)
    yy = rng.randint(0, 10, n)
    xx = rng.randint(0, 12, n)
    flat = (zz * 10 + yy) * 12 + xx
    flat = np.unique(flat)[:n]
    n = len(flat)
    co[:n, 0] = flat // 120
    co[:n, 1] = (flat // 12) % 10
    co[:n, 2] = flat % 12
    maps = sm.build_bev_maps(co, n, (10, 12))
    want = sorted(set((int(y), int(x)) for y, x in zip(co[:n, 1], co[:n, 2])))
    nb = int(maps['sp_bev_mask'].sum())
    got = [tuple(v) for v in maps['sp_bev_coords'][:nb]]
    assert got == want
    for i in range(n):
        s = maps['sp_bev_from_out'][i]
        assert tuple(maps['sp_bev_coords'][s]) == (co[i, 1], co[i, 2])
    # submap brute force
    lut = {v: i for i, v in enumerate(got)}
    for i, (y, x) in enumerate(got):
        for k, (dy, dx) in enumerate([(dy, dx) for dy in (-1, 0, 1)
                                      for dx in (-1, 0, 1)]):
            q = (y + dy, x + dx)
            want_slot = lut.get(q, cap) \
                if 0 <= q[0] < 10 and 0 <= q[1] < 12 else cap
            assert maps['sp_bev_submap'][i, k] == want_slot


def test_voxelnext_sparse_assembly(rng):
    cfg = model_cfg()
    ds = ds_cfg()
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_sparse_batch(rng)
    prepare = get_host_prepare(cfg, ds)
    batch = prepare(batch)
    assert 'sp_bev_submap' in batch
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert 'hm_loss' in tb and 'loc_loss' in tb
    g = jax.grad(lambda p: model.apply(
        {'params': p, 'batch_stats': variables['batch_stats']}, batch,
        training=True, mutable=['batch_stats'],
        method=model.forward_with_loss)[0][0])(variables['params'])
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[0] == 2
    assert dets['pred_boxes'].shape[2] == 7


def test_voxelnext_target_nearest_slot(rng):
    """A gt centered on an active cell maps its `inds` to that slot and the
    heatmap peaks (==1 area) there (`assign_target_of_single_head`)."""
    from pdm_ssd_tpu.models.dense_heads.voxelnext_head import VoxelNeXtHead
    cfg = model_cfg()['DENSE_HEAD']
    head = VoxelNeXtHead(model_cfg=cfg, input_channels=8, num_class=3,
                         point_cloud_range=(0, -16, -3, 32, 16, 1),
                         voxel_size=(0.5, 0.5),
                         class_names=('Car', 'Pedestrian', 'Cyclist'))
    capb = 16
    bev_coords = np.zeros((1, capb, 2), np.int32)
    bev_coords[0, :4] = [[2, 3], [2, 4], [5, 1], [7, 7]]
    bev_mask = np.zeros((1, capb), bool)
    bev_mask[0, :4] = True
    # gt at cell (y=2, x=4) of the stride-8 map: x = 4*8*0.5 = 16, y = -16 + 2*8*0.5 = -8
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [16.2, -7.9, -1, 3.9, 1.6, 1.5, 0.3, 1]
    gmask = np.zeros((1, 2), bool)
    gmask[0, 0] = True
    tgts = head.assign_targets(jnp.asarray(gt), jnp.asarray(gmask),
                               jnp.asarray(bev_coords), jnp.asarray(bev_mask))
    t = tgts[0]
    assert int(t['inds'][0, 0]) == 1          # slot of (2, 4)
    assert int(t['masks'][0, 0]) == 1
    hm = np.asarray(t['heatmaps'])[0, 0]      # class Car
    assert hm.argmax() == 1 and hm[1] > 0.99
    # offsets relative to the chosen slot
    np.testing.assert_allclose(np.asarray(t['target_boxes'])[0, 0, 0],
                               16.2 / 4.0 - 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t['target_boxes'])[0, 0, 6],
                               np.cos(0.3), atol=1e-5)


def test_voxelnext_gather_bwd_matches_autodiff(rng):
    """BEV submanifold maps are self-transpose: the head's gather-transpose
    backward must match XLA autodiff gradients (GATHER_BWD on/off)."""
    cfg = model_cfg()
    ds = ds_cfg()
    batch = make_sparse_batch(rng)
    # upmaps so the BACKBONE also runs its gather-transpose backward
    batch = get_host_prepare(cfg, ds, training=True)(batch)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    grads = {}
    for gb in (True, False):
        cfg.DENSE_HEAD.GATHER_BWD = gb
        if not gb:
            batch = {k: v for k, v in batch.items()
                     if not k.startswith('sp_upmap')}
        model = build_network(cfg, num_class=3, dataset_cfg=ds,
                              class_names=['Car', 'Pedestrian', 'Cyclist'])
        variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                               training=False)
        grads[gb] = jax.grad(lambda p: model.apply(
            {'params': p, 'batch_stats': variables['batch_stats']}, batch,
            training=True, mutable=['batch_stats'],
            method=model.forward_with_loss)[0][0])(variables['params'])
    fa = dict((jax.tree_util.keystr(p), v) for p, v in
              jax.tree_util.tree_flatten_with_path(grads[False])[0])
    for path, v in jax.tree_util.tree_flatten_with_path(grads[True])[0]:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(fa[jax.tree_util.keystr(path)]),
            rtol=2e-4, atol=2e-5, err_msg=jax.tree_util.keystr(path))
