"""Round-trip and semantics tests for box coders, box ops and losses."""
import numpy as np
import jax.numpy as jnp

from pdm_ssd_tpu.ops import box_ops, coders, losses
from pdm_ssd_tpu.ops import centernet


def test_residual_coder_roundtrip(rng):
    coder = coders.ResidualCoder()
    anchors = np.abs(rng.randn(10, 7)).astype(np.float32) + 0.5
    boxes = anchors + 0.1 * rng.randn(10, 7).astype(np.float32)
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = coder.decode(enc, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(dec), boxes, rtol=1e-4, atol=1e-4)


def test_residual_coder_sincos_roundtrip(rng):
    coder = coders.ResidualCoder(encode_angle_by_sincos=True)
    anchors = np.abs(rng.randn(10, 7)).astype(np.float32) + 0.5
    boxes = anchors.copy()
    boxes[:, 6] = rng.uniform(-1.5, 1.5, 10)
    dec = coder.decode(coder.encode(jnp.asarray(boxes), jnp.asarray(anchors)),
                       jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(dec)[:, :6], boxes[:, :6], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.sin(np.asarray(dec)[:, 6]), np.sin(boxes[:, 6]), atol=1e-4)


def test_point_residual_coder_roundtrip(rng):
    coder = coders.PointResidualCoder(mean_size=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73)))
    points = rng.randn(20, 3).astype(np.float32)
    gt = np.concatenate([
        points + 0.2 * rng.randn(20, 3).astype(np.float32),
        np.abs(rng.randn(20, 3)).astype(np.float32) + 0.5,
        rng.uniform(-np.pi, np.pi, (20, 1)).astype(np.float32),
    ], axis=1)
    cls = rng.randint(1, 3, 20)
    enc = coder.encode(jnp.asarray(gt), jnp.asarray(points), jnp.asarray(cls))
    dec = coder.decode(enc, jnp.asarray(points), jnp.asarray(cls))
    np.testing.assert_allclose(np.asarray(dec)[:, :6], gt[:, :6], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.cos(np.asarray(dec)[:, 6]), np.cos(gt[:, 6]), atol=1e-4)


def test_points_in_boxes():
    boxes = np.array([[0, 0, 0, 4, 2, 2, np.pi / 2]], np.float32)  # rotated: extends 1 in x, 2 in y
    pts = np.array([
        [0.9, 0.0, 0.0],   # inside
        [1.5, 0.0, 0.0],   # outside x (after rotation dx along y)
        [0.0, 1.9, 0.0],   # inside
        [0.0, 0.0, 1.5],   # outside z
    ], np.float32)
    got = np.asarray(box_ops.points_in_boxes(pts, boxes))
    np.testing.assert_array_equal(got, [0, -1, 0, -1])


def test_points_in_boxes_first_match():
    boxes = np.array([
        [0, 0, 0, 2, 2, 2, 0.0],
        [0, 0, 0, 4, 4, 4, 0.0],
    ], np.float32)
    pts = np.array([[0.1, 0.1, 0.1], [1.5, 1.5, 1.5]], np.float32)
    got = np.asarray(box_ops.points_in_boxes(pts, boxes))
    np.testing.assert_array_equal(got, [0, 1])


def test_sigmoid_focal_matches_bce_at_gamma0():
    logits = jnp.asarray(np.linspace(-3, 3, 12, dtype=np.float32).reshape(4, 3))
    target = jnp.asarray(np.eye(4, 3, dtype=np.float32))
    w = jnp.ones((4,))
    got = losses.sigmoid_focal_loss(logits, target, w, gamma=0.0, alpha=0.5)
    bce = losses.sigmoid_bce_with_logits(logits, target) * 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(bce), rtol=1e-5)


def test_centernet_focal_perfect_prediction():
    gt = jnp.zeros((1, 1, 8, 8)).at[0, 0, 4, 4].set(1.0)
    pred = jnp.clip(gt, 1e-4, 1 - 1e-4)
    loss = float(losses.centernet_focal_loss(pred, gt))
    assert loss < 0.01


def test_centernet_reg_loss_masks():
    pred = jnp.ones((1, 4, 2))
    target = jnp.zeros((1, 4, 2)).at[0, 0].set(1.0)
    mask = jnp.asarray([[1, 1, 0, 0]])
    loss = losses.centernet_reg_loss(pred, mask, target)
    # obj0 matches, obj1 off by 1 in both codes, objs 2,3 masked; num=2
    np.testing.assert_allclose(np.asarray(loss), [0.5, 0.5], atol=1e-6)


def test_gaussian_heatmap_targets():
    gt = np.zeros((3, 8), np.float32)
    gt[0] = [10.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.3, 1]
    gt[1] = [30.0, 10.0, -1.0, 0.8, 0.7, 1.7, 0.0, 2]
    valid = np.array([True, True, False])
    hm, ret_boxes, inds, mask, _src = centernet.assign_center_targets(
        jnp.asarray(gt), jnp.asarray(valid), num_classes=3,
        feature_map_size=(176, 200), feature_map_stride=1,
        voxel_size=(0.4, 0.4), point_cloud_range=(0., -40., -3., 70.4, 40., 1.),
        num_max_objs=3,
    )
    hm = np.asarray(hm)
    assert hm.shape == (3, 200, 176)
    assert np.asarray(mask).tolist() == [1, 1, 0]
    # peak at the gt center cell, on the right class channel
    cx = int((10.0 - 0.0) / 0.4)
    cy = int((0.0 + 40.0) / 0.4)
    assert hm[0, cy, cx] == 1.0
    assert hm[1].max() == 1.0
    assert hm[2].max() == 0.0
    assert int(np.asarray(inds)[0]) == cy * 176 + cx
    # regression targets: z, log-dims, cos/sin
    rb = np.asarray(ret_boxes)[0]
    np.testing.assert_allclose(rb[2], -1.0, atol=1e-5)
    np.testing.assert_allclose(rb[3:6], np.log([4.0, 2.0, 1.5]), atol=1e-3)
    np.testing.assert_allclose(rb[6:8], [np.cos(0.3), np.sin(0.3)], atol=1e-5)


def test_corners_and_rotation():
    b = jnp.asarray([[0, 0, 0, 4, 2, 2, 0.0]], jnp.float32)
    c = np.asarray(box_ops.boxes_to_corners_3d(b))[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(np.abs(c[:, 0]).max(), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(c[:, 1]).max(), 1.0, atol=1e-5)
