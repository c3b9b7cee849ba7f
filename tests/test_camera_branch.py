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


def test_swin_4stage_pyramid_droppath_and_lss_fpn():
    """Reference-scope Swin shape: 4 config-driven stages with stochastic
    depth, multi-scale pyramid outputs (RETURN_PYRAMID/OUT_INDICES), and the
    standalone GeneralizedLSSFPN neck (reference
    `backbones_image/swin.py` + `img_neck/generalized_lss.py`)."""
    from pdm_ssd_tpu.models.backbones_image import (SwinTransformer,
                                                    GeneralizedLSSFPN)
    rng = np.random.RandomState(9)
    imgs = jnp.asarray(rng.rand(1, 2, 64, 96, 3), jnp.float32)
    bb = SwinTransformer(model_cfg=CfgNode({
        'EMBED_DIM': 8, 'DEPTHS': [1, 1, 2, 1], 'NUM_HEADS': [1, 2, 4, 8],
        'WINDOW_SIZE': 4, 'PATCH_SIZE': 4, 'DROP_PATH_RATE': 0.3,
        'RETURN_PYRAMID': True, 'OUT_INDICES': [1, 2, 3]}))
    v = bb.init(jax.random.PRNGKey(0), imgs)
    feats = bb.apply(v, imgs)
    # patch 4 -> /4 base; out indices 1..3 -> /8, /16, /32
    assert [tuple(f.shape) for f in feats] == [
        (1, 2, 8, 12, 16), (1, 2, 4, 6, 32), (1, 2, 2, 3, 64)]

    # drop_path: stochastic across dropout rngs in training (deepest level,
    # where the linearly-increasing rate is largest; several key pairs since
    # per-sample Bernoulli masks can coincide), deterministic at eval
    bb_dp = SwinTransformer(model_cfg=CfgNode({
        'EMBED_DIM': 8, 'DEPTHS': [1, 1, 2, 1], 'NUM_HEADS': [1, 2, 4, 8],
        'WINDOW_SIZE': 4, 'PATCH_SIZE': 4, 'DROP_PATH_RATE': 0.9,
        'RETURN_PYRAMID': True, 'OUT_INDICES': [1, 2, 3]}))
    outs = [np.asarray(bb_dp.apply(v, imgs, training=True,
                                   rngs={'dropout': jax.random.PRNGKey(k)}
                                   )[-1]) for k in range(4)]
    assert any(not np.allclose(outs[0], o) for o in outs[1:]), \
        'drop_path inert in training mode'
    e1 = bb.apply(v, imgs)
    e2 = bb.apply(v, imgs)
    np.testing.assert_array_equal(np.asarray(e1[0]), np.asarray(e2[0]))

    fpn = GeneralizedLSSFPN(model_cfg=CfgNode({
        'IN_CHANNELS': [16, 32, 64], 'OUT_CHANNELS': 24, 'NUM_OUTS': 2,
        'START_LEVEL': 0, 'END_LEVEL': -1}))
    fv = fpn.init(jax.random.PRNGKey(1), feats)
    outs, _ = fpn.apply(fv, feats, training=True, mutable=['batch_stats'])
    assert [tuple(o.shape) for o in outs] == [
        (1, 2, 8, 12, 24), (1, 2, 4, 6, 24)]
    # top-down flow: perturbing the coarsest input changes the finest output
    feats2 = [feats[0], feats[1], feats[2] + 1.0]
    outs2 = fpn.apply(fv, feats2)
    assert not np.allclose(np.asarray(outs2[0]), np.asarray(outs[0] if not
                           isinstance(outs, tuple) else outs[0]))


def test_bevfusion_swin_neck_e2e():
    """BEVFusion assembled with the 4-stage Swin + GeneralizedLSSFPN neck
    (the reference bevfusion.yaml topology), forward + loss + predict."""
    from pdm_ssd_tpu.models import build_network
    import sys
    sys.path.insert(0, 'tests')
    from test_detector3d_zoo import ds_cfg_voxel, make_batch, centerpoint_cfg

    head = centerpoint_cfg().DENSE_HEAD
    head.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE = 1
    cfg = CfgNode({
        'NAME': 'BevFusion',
        'IMAGE_BACKBONE': {
            'NAME': 'SwinTransformer', 'EMBED_DIM': 8,
            'DEPTHS': [1, 1, 2, 1], 'NUM_HEADS': [1, 2, 4, 8],
            'WINDOW_SIZE': 4, 'PATCH_SIZE': 4, 'DROP_PATH_RATE': 0.1,
            'RETURN_PYRAMID': True, 'OUT_INDICES': [1, 2, 3]},
        'NECK': {'IN_CHANNELS': [16, 32, 64], 'OUT_CHANNELS': 16,
                 'NUM_OUTS': 2, 'START_LEVEL': 0, 'END_LEVEL': -1},
        'VTRANSFORM': {
            'IN_CHANNEL': 16, 'OUT_CHANNEL': 8,
            'IMAGE_SIZE': [64, 96], 'FEATURE_SIZE': [8, 12],
            'XBOUND': [0.0, 32.0, 1.0], 'YBOUND': [-16.0, 16.0, 1.0],
            'ZBOUND': [-4.0, 4.0, 8.0], 'DBOUND': [1.0, 17.0, 2.0],
            'DOWNSAMPLE': 1},
        'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False,
                'USE_ABSLOTE_XYZ': True, 'USE_NORM': True,
                'NUM_FILTERS': [16]},
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
    rng = np.random.RandomState(13)
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
    (loss, _), _ = model.apply(variables, batch, training=True,
                               mutable=['batch_stats'],
                               rngs={'dropout': jax.random.PRNGKey(3)},
                               method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[-1] == 7
