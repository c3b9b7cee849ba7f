"""Camera branch pieces: bev_pool, DepthLSSTransform, image backbone, fuser."""
import numpy as np
import jax
import jax.numpy as jnp

from pdm_ssd_tpu.ops.bev_pool import bev_pool
from pdm_ssd_tpu.models.view_transforms.depth_lss import DepthLSSTransform
from pdm_ssd_tpu.models.backbones_image import ConvImageBackbone, ConvFuser
from pdm_ssd_tpu.utils.config import CfgNode


def test_bev_pool_sums_into_cells():
    B, P, C = 2, 6, 3
    feats = jnp.ones((B, P, C))
    coords = jnp.zeros((B, P, 3), jnp.int32)
    coords = coords.at[0, 1].set(jnp.array([1, 2, 0]))
    coords = coords.at[0, 2].set(jnp.array([1, 2, 1]))  # same xy, z=1
    coords = coords.at[0, 3].set(jnp.array([-1, 0, 0]))  # dropped
    coords = coords.at[0, 4].set(jnp.array([7, 0, 0]))   # out of X -> dropped
    valid = jnp.ones((B, P), bool).at[0, 5].set(False)
    out = bev_pool(feats, coords, valid, (4, 5, 2))      # (B, 5, 4, 2*3)
    assert out.shape == (B, 5, 4, 6)
    o = np.asarray(out)
    # cell (0,0) z=0 collected points 0 (and none else for b=0)
    np.testing.assert_allclose(o[0, 0, 0, :3], [1, 1, 1])
    np.testing.assert_allclose(o[0, 2, 1, :3], [1, 1, 1])   # z=0 slot
    np.testing.assert_allclose(o[0, 2, 1, 3:], [1, 1, 1])   # z=1 slot
    # dropped points contributed nowhere
    assert np.allclose(o[0].sum(), 9.0)

    # gradient flows (scatter-add VJP = gather)
    g = jax.grad(lambda f: jnp.sum(bev_pool(f, coords, valid, (4, 5, 2)) ** 2))(feats)
    assert np.isfinite(np.asarray(g)).all()


def _lss_cfg():
    return CfgNode({
        'IN_CHANNEL': 16, 'OUT_CHANNEL': 8,
        'IMAGE_SIZE': [64, 96], 'FEATURE_SIZE': [8, 12],
        'XBOUND': [0.0, 32.0, 1.0], 'YBOUND': [-16.0, 16.0, 1.0],
        'ZBOUND': [-4.0, 4.0, 8.0], 'DBOUND': [1.0, 17.0, 2.0],
        'DOWNSAMPLE': 1})


def test_depth_lss_transform_shapes_and_grad():
    cfg = _lss_cfg()
    B, N = 1, 2
    rng = np.random.RandomState(0)
    intr = np.tile(np.array([[50., 0, 48], [0, 50., 32], [0, 0, 1]],
                            np.float32), (B, N, 1, 1))
    c2l = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    c2l[..., 0, 3] = 1.0
    batch = {
        'camera_feats': jnp.asarray(rng.rand(B, N, 8, 12, 16), jnp.float32),
        'camera_depth': jnp.asarray(rng.rand(B, N, 64, 96, 1), jnp.float32),
        'camera2lidar': jnp.asarray(c2l),
        'camera_intrinsics': jnp.asarray(intr),
    }
    mod = DepthLSSTransform(model_cfg=cfg)
    variables = mod.init(jax.random.PRNGKey(0), batch)
    out = mod.apply(variables, batch)
    sf = out['spatial_features']
    assert sf.shape == (B, 32, 32, 8)        # (Y, X, Z*C) with Z=1
    assert np.isfinite(np.asarray(sf)).all()
    assert np.abs(np.asarray(sf)).sum() > 0  # frustum lands inside the grid

    def loss(p):
        o = mod.apply({'params': p, 'batch_stats': variables['batch_stats']},
                      batch)
        return jnp.sum(o['spatial_features'] ** 2)
    g = jax.grad(loss)(variables['params'])
    total = sum(np.abs(np.asarray(v)).sum() for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_image_backbone_and_fuser():
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(1, 2, 64, 96, 3), jnp.float32)
    bb = ConvImageBackbone(model_cfg=CfgNode({'NUM_FILTERS': [8, 16, 32],
                                              'OUT_CHANNEL': 16}))
    v = bb.init(jax.random.PRNGKey(0), imgs)
    feats = bb.apply(v, imgs)
    assert feats.shape == (1, 2, 8, 12, 16)

    fus = ConvFuser(model_cfg=CfgNode({'OUT_CHANNEL': 24}))
    lidar = jnp.asarray(rng.rand(1, 16, 16, 32), jnp.float32)
    cam = jnp.asarray(rng.rand(1, 16, 16, 16), jnp.float32)
    vf = fus.init(jax.random.PRNGKey(1), lidar, cam)
    out = fus.apply(vf, lidar, cam)
    assert out.shape == (1, 16, 16, 24)


def test_bevfusion_detector_e2e():
    from pdm_ssd_tpu.models import build_network
    import sys
    sys.path.insert(0, 'tests')
    from test_detector3d_zoo import ds_cfg_voxel, make_batch, centerpoint_cfg

    head = centerpoint_cfg().DENSE_HEAD
    head.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE = 1
    cfg = CfgNode({
        'NAME': 'BevFusion',
        'IMAGE_BACKBONE': {'NUM_FILTERS': [8, 16, 32], 'OUT_CHANNEL': 16},
        'VTRANSFORM': {
            'IN_CHANNEL': 16, 'OUT_CHANNEL': 8,
            'IMAGE_SIZE': [64, 96], 'FEATURE_SIZE': [8, 12],
            'XBOUND': [0.0, 32.0, 1.0], 'YBOUND': [-16.0, 16.0, 1.0],
            'ZBOUND': [-4.0, 4.0, 8.0], 'DBOUND': [1.0, 17.0, 2.0],
            'DOWNSAMPLE': 1},
        'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False,
                'USE_ABSLOTE_XYZ': True, 'USE_NORM': True, 'NUM_FILTERS': [16]},
        'MAP_TO_BEV': {'NAME': 'PointPillarScatter', 'NUM_BEV_FEATURES': 16},
        'FUSER': {'OUT_CHANNEL': 24},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1],
                        'LAYER_STRIDES': [1], 'NUM_FILTERS': [16],
                        'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [16]},
        'DENSE_HEAD': head,
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.05,
            'NMS_CONFIG': {'NMS_TYPE': 'circle_nms', 'NMS_RADIUS': 0.8,
                           'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16}},
    })
    rng = np.random.RandomState(3)
    model = build_network(cfg, num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    B, N = 2, 2
    intr = np.tile(np.array([[50., 0, 48], [0, 50., 32], [0, 0, 1]],
                            np.float32), (B, N, 1, 1))
    c2l = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    batch.update({
        'camera_imgs': jnp.asarray(rng.rand(B, N, 64, 96, 3), jnp.float32),
        'camera_depth': jnp.asarray(rng.rand(B, N, 64, 96, 1), jnp.float32),
        'camera2lidar': jnp.asarray(c2l),
        'camera_intrinsics': jnp.asarray(intr),
    })
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[-1] == 7


def test_caddn_detector_e2e():
    from pdm_ssd_tpu.models import build_network
    import sys
    sys.path.insert(0, 'tests')
    from test_detector3d_zoo import ds_cfg_voxel, make_batch, pointpillar_cfg

    head = pointpillar_cfg().DENSE_HEAD
    head.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE = 2
    cfg = CfgNode({
        'NAME': 'CaDDN',
        'IMAGE_BACKBONE': {'NUM_FILTERS': [8, 16, 32], 'OUT_CHANNEL': 16},
        'FRUSTUM': {'NUM_DEPTH_BINS': 8, 'DEPTH_MIN': 2.0, 'DEPTH_MAX': 40.0,
                    'OUT_CHANNEL': 8},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1],
                        'LAYER_STRIDES': [2], 'NUM_FILTERS': [16],
                        'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [16]},
        'DENSE_HEAD': head,
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.05,
            'NMS_CONFIG': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.1,
                           'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16}},
    })
    rng = np.random.RandomState(5)
    model = build_network(cfg, num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    B = 2
    l2c = np.tile(np.array([[0., -1, 0, 0], [0, 0, -1, 0],
                            [1, 0, 0, 0], [0, 0, 0, 1]], np.float32),
                  (B, 1, 1))
    c2i = np.tile(np.array([[60., 0, 48, 0], [0, 60., 32, 0],
                            [0, 0, 1, 0]], np.float32), (B, 1, 1))
    batch.update({
        'camera_imgs': jnp.asarray(rng.rand(B, 1, 64, 96, 3), jnp.float32),
        'trans_lidar_to_cam': jnp.asarray(l2c),
        'trans_cam_to_img': jnp.asarray(c2i),
    })
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[-1] == 7


def test_swin_transformer_backbone():
    from pdm_ssd_tpu.models.backbones_image import SwinTransformer
    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.rand(1, 2, 64, 96, 3), jnp.float32)
    bb = SwinTransformer(model_cfg=CfgNode({
        'EMBED_DIM': 24, 'DEPTHS': [2, 2, 2], 'NUM_HEADS': [2, 2, 4],
        'WINDOW_SIZE': 4, 'PATCH_SIZE': 2, 'OUT_CHANNEL': 16}))
    v = bb.init(jax.random.PRNGKey(0), imgs)
    feats = bb.apply(v, imgs)
    assert feats.shape == (1, 2, 8, 12, 16)
    assert np.isfinite(np.asarray(feats)).all()

    # shifted-window masking: two distant patches in different windows should
    # not exchange information in a single non-shifted block, but the full
    # stack (with shifts) must propagate a perturbation globally
    imgs2 = imgs.at[0, 0, 0, 0, :].add(5.0)
    f2 = bb.apply(v, imgs2)
    delta = np.abs(np.asarray(f2 - feats))[0, 0]
    assert delta.max() > 0
    # shifted windows propagate beyond the original 4-cell window
    assert delta[4:, :].sum() > 0 and delta[:, 5:].sum() > 0

    g = jax.grad(lambda p: jnp.sum(bb.apply(
        {'params': p}, imgs) ** 2))(v['params'])
    total = sum(np.abs(np.asarray(x)).sum() for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
