"""CaDDN categorical-depth supervision (VERDICT r2 item 4): bin_depths
against the reference closed forms, fg-mask brute force, DDN loss overfit
placing probability mass in the correct depth bins."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.ops.depth import bin_depths, compute_fg_mask, ddn_loss


def test_bin_depths_modes(rng):
    d = rng.uniform(0, 50, (4, 6)).astype(np.float32)
    dmin, dmax, D = 2.0, 46.8, 80
    # UD closed form
    ud = np.asarray(bin_depths(jnp.asarray(d), 'UD', dmin, dmax, D))
    np.testing.assert_allclose(ud, (d - dmin) / ((dmax - dmin) / D),
                               rtol=1e-5)
    # LID: bin i spans [dmin + s*i*(i+1)/2 ...] with s = 2(dmax-dmin)/(D(D+1))
    lid = np.asarray(bin_depths(jnp.asarray(d), 'LID', dmin, dmax, D,
                                target=True))
    s = 2 * (dmax - dmin) / (D * (D + 1))
    for val, idx in zip(d.ravel(), lid.ravel()):
        if val < dmin or val > dmax:
            assert idx == D
        else:
            lo = dmin + s * idx * (idx + 1) / 2
            hi = dmin + s * (idx + 1) * (idx + 2) / 2
            assert lo - 1e-3 <= val <= hi + 1e-3, (val, idx, lo, hi)
    # SID monotone + bounds
    sid = np.asarray(bin_depths(jnp.asarray(np.sort(d.ravel())), 'SID',
                                dmin, dmax, D))
    assert (np.diff(sid) >= 0).all()


def test_fg_mask_brute(rng):
    B, H, W, N = 2, 16, 24, 3
    boxes = np.zeros((B, N, 4), np.float32)
    for b in range(B):
        for n in range(N):
            u1, v1 = rng.randint(0, 40, 2)
            boxes[b, n] = [u1, v1, u1 + rng.randint(2, 10),
                           v1 + rng.randint(2, 10)]
    f = 2
    got = np.asarray(compute_fg_mask(jnp.asarray(boxes), (B, H, W), f))
    want = np.zeros((B, H, W), bool)
    for b in range(B):
        for n in range(N):
            u1, v1, u2, v2 = boxes[b, n] / f
            want[b, int(np.floor(v1)):int(np.ceil(v2)),
                 int(np.floor(u1)):int(np.ceil(u2))] = True
    np.testing.assert_array_equal(got, want)


def test_ddn_loss_overfit(rng):
    """A few gradient steps on fixed targets must concentrate predicted mass
    in the correct bins and shrink the loss (VERDICT item 4 done-criterion)."""
    B, H, W, D = 1, 8, 12, 10
    depth = rng.uniform(3.0, 40.0, (B, H, W)).astype(np.float32)
    boxes = np.array([[[2., 2., 20., 10.]]], np.float32)
    logits = jnp.asarray(rng.randn(B, H, W, D + 1).astype(np.float32)) * 0.1
    disc = {'mode': 'LID', 'depth_min': 2.0, 'depth_max': 46.8}

    def f(lg):
        return ddn_loss(lg, jnp.asarray(depth), jnp.asarray(boxes),
                        disc_cfg=disc)[0]

    g = jax.jit(jax.grad(f))
    l0 = float(f(logits))
    for _ in range(100):
        logits = logits - 1.0 * g(logits)
    l1 = float(f(logits))
    assert l1 < 0.3 * l0, (l0, l1)
    target = np.asarray(bin_depths(jnp.asarray(depth), 'LID', 2.0, 46.8, D,
                                   target=True))
    pred = np.asarray(jnp.argmax(logits, -1))
    assert (pred == target).mean() > 0.9


def test_caddn_with_depth_supervision(rng):
    """Full CaDDN train step with DDN loss active: depth-loss term appears
    in tb and is finite; gradients flow to the depth head."""
    import sys
    sys.path.insert(0, 'tests')
    from pdm_ssd_tpu.utils.config import CfgNode
    from pdm_ssd_tpu.models import build_network
    from test_detector3d_zoo import ds_cfg_voxel, make_batch, pointpillar_cfg

    head = pointpillar_cfg().DENSE_HEAD
    head.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE = 2
    cfg = CfgNode({
        'NAME': 'CaDDN',
        'IMAGE_BACKBONE': {'NUM_FILTERS': [8, 16, 32], 'OUT_CHANNEL': 16},
        'FRUSTUM': {'NUM_DEPTH_BINS': 8, 'DEPTH_MIN': 2.0, 'DEPTH_MAX': 40.0,
                    'OUT_CHANNEL': 8},
        'DDN_LOSS': {'WEIGHT': 3.0, 'ALPHA': 0.25, 'GAMMA': 2.0,
                     'FG_WEIGHT': 13.0, 'BG_WEIGHT': 1.0, 'MODE': 'LID'},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1],
                        'LAYER_STRIDES': [2], 'NUM_FILTERS': [16],
                        'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [16]},
        'DENSE_HEAD': head,
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.05,
            'NMS_CONFIG': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.1,
                           'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16}},
    })
    model = build_network(cfg, num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    B = 2
    l2c = np.tile(np.array([[0., -1, 0, 0], [0, 0, -1, 0],
                            [1, 0, 0, 0], [0, 0, 0, 1]], np.float32),
                  (B, 1, 1))
    c2i = np.tile(np.array([[60., 0, 48, 0], [0, 60., 32, 0],
                            [0, 0, 1, 0]], np.float32), (B, 1, 1))
    # feature map of the conv image backbone is 1/8 of 64x96 -> 8x12
    batch.update({
        'camera_imgs': jnp.asarray(rng.rand(B, 1, 64, 96, 3), jnp.float32),
        'trans_lidar_to_cam': jnp.asarray(l2c),
        'trans_cam_to_img': jnp.asarray(c2i),
        'depth_maps': jnp.asarray(
            rng.uniform(3, 38, (B, 8, 12)), jnp.float32),
        'gt_boxes2d': jnp.asarray([[[10., 8., 60., 40.]]] * B),
        'gt_boxes2d_mask': jnp.ones((B, 1), bool),
    })
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert 'ddn_loss' in tb and np.isfinite(float(tb['ddn_loss']))

    def depth_loss_only(p):
        (l, t), _ = model.apply(
            {'params': p, 'batch_stats': variables['batch_stats']}, batch,
            training=True, mutable=['batch_stats'],
            method=model.forward_with_loss)
        return t['ddn_loss']

    g = jax.grad(depth_loss_only)(variables['params'])
    dh = g['depth_head']
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(dh))
    assert gn > 0
