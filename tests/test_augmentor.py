"""Host-side augmentation correctness: geometry consistency of global
transforms, and GT-sampler collision rejection."""
import numpy as np

from pdm_ssd_tpu.datasets.augmentor import augmentor_utils as au
from pdm_ssd_tpu.utils import np_iou


def make_scene(rng):
    boxes = np.array([[10., 5., -1., 4., 2., 1.5, 0.3]], np.float32)
    pts = rng.randn(50, 4).astype(np.float32)
    pts[:, :3] = pts[:, :3] * 0.4 + boxes[0, :3]
    return boxes, pts


def test_flip_consistency(rng):
    boxes, pts = make_scene(rng)
    b2, p2, enabled = au.random_flip_along_x(boxes.copy(), pts.copy(), enable_prob=1.0)
    assert enabled
    np.testing.assert_allclose(b2[0, 1], -boxes[0, 1])
    np.testing.assert_allclose(b2[0, 6], -boxes[0, 6])
    np.testing.assert_allclose(p2[:, 1], -pts[:, 1])
    # point-box relative geometry preserved: distances to center unchanged
    d_before = np.linalg.norm(pts[:, :3] - boxes[0, :3], axis=1)
    d_after = np.linalg.norm(p2[:, :3] - b2[0, :3], axis=1)
    np.testing.assert_allclose(d_before, d_after, rtol=1e-5)


def test_rotation_consistency(rng):
    boxes, pts = make_scene(rng)
    b2, p2, angle = au.global_rotation(boxes.copy(), pts.copy(), [0.5, 0.5])
    np.testing.assert_allclose(angle, 0.5)
    np.testing.assert_allclose(b2[0, 6], boxes[0, 6] + 0.5, rtol=1e-5)
    d_before = np.linalg.norm(pts[:, :3] - boxes[0, :3], axis=1)
    d_after = np.linalg.norm(p2[:, :3] - b2[0, :3], axis=1)
    np.testing.assert_allclose(d_before, d_after, rtol=1e-4)
    # rotation preserves norms around origin
    np.testing.assert_allclose(np.linalg.norm(pts[:, :2], axis=1),
                               np.linalg.norm(p2[:, :2], axis=1), rtol=1e-4)


def test_scaling_consistency(rng):
    boxes, pts = make_scene(rng)
    # note: a degenerate range (hi - lo < 1e-3) disables scaling like the
    # reference, so use a real interval
    b2, p2, s = au.global_scaling(boxes.copy(), pts.copy(), [1.02, 1.08])
    assert 1.02 <= s <= 1.08
    np.testing.assert_allclose(b2[0, :6], boxes[0, :6] * s, rtol=1e-5)
    np.testing.assert_allclose(p2[:, :3], pts[:, :3] * s, rtol=1e-5)
    np.testing.assert_allclose(p2[:, 3], pts[:, 3])  # intensity untouched


def test_sampler_collision_rejection():
    """Sampled boxes overlapping existing gt (BEV IoU > 0) must be rejected
    (`database_sampler.py:471-476` behavior)."""
    from pdm_ssd_tpu.datasets.augmentor.database_sampler import DataBaseSampler
    existing = np.array([[10., 0., -1., 4., 2., 1.5, 0.0]], np.float32)
    sampled = np.array([
        [10.5, 0.2, -1., 4., 2., 1.5, 0.1],   # collides with existing
        [30., 10., -1., 4., 2., 1.5, 0.0],    # clear
        [30.4, 10.2, -1., 4., 2., 1.5, 0.3],  # collides with the one above
    ], np.float32)
    iou1 = np_iou.boxes_bev_iou_cpu(sampled, existing)
    iou2 = np_iou.boxes_bev_iou_cpu(sampled, sampled)
    iou2[range(3), range(3)] = 0
    valid = ((iou1.max(axis=1) + iou2.max(axis=1)) == 0)
    assert valid.tolist() == [False, False, False] or valid.tolist() == [False, True, False] \
        or valid.tolist() == [False, False, True]
    # the clear box collides only with #2; between them exactly one family wins
    assert not valid[0]
