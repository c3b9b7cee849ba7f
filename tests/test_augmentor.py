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


def test_road_plane_snapping():
    """Sampled boxes must land with their bottom face on the road plane
    (`database_sampler.py:149-167` behavior)."""
    from pdm_ssd_tpu.datasets.augmentor.database_sampler import DataBaseSampler
    from pdm_ssd_tpu.datasets.kitti.calibration import Calibration

    P2 = np.array([[700., 0., 600., 0.], [0., 700., 180., 0.],
                   [0., 0., 1., 0.]], np.float32)
    R0 = np.eye(3, dtype=np.float32)
    V2C = np.array([[0., -1., 0., 0.], [0., 0., -1., 0.],
                    [1., 0., 0., 0.]], np.float32)
    calib = Calibration({'P2': P2, 'R0': R0, 'Tr_velo2cam': V2C})

    # lidar plane z = -1.6  <=>  camera y = +1.6 (y down): 0*x + 1*y + 0*z - 1.6 = 0
    plane = np.array([0., -1., 0., 1.6])  # get_road_plane flips to b < 0
    plane = plane / np.linalg.norm(plane[:3])

    boxes = np.array([[12., 3., 0.7, 4., 2., 1.5, 0.2],
                      [25., -6., -3.0, 4., 2., 1.5, 1.1]], np.float32)
    sampler = DataBaseSampler.__new__(DataBaseSampler)  # geometry-only
    dz = sampler._snap_to_road_plane(
        boxes, {'calib': calib, 'road_plane': plane})
    bottoms = boxes[:, 2] - boxes[:, 5] / 2
    np.testing.assert_allclose(bottoms, -1.6, atol=1e-5)
    assert dz.shape == (2,)


def test_sample_points_semantics(rng):
    from pdm_ssd_tpu.datasets.processor.data_processor import DataProcessor
    from pdm_ssd_tpu.utils.config import as_cfg
    pts = rng.rand(500, 4).astype(np.float32) * 10
    pts[:100, 0] = 60.0  # 100 far points (depth >= 40)
    proc = DataProcessor.__new__(DataProcessor)
    proc.mode = 'train'
    step = proc._build_sample_points(as_cfg({'NUM_POINTS': {'train': 300}}))
    out = step({'points': pts.copy()})['points']
    assert out.shape == (300, 4)
    # all far points survive when the budget allows
    assert (out[:, 0] == 60.0).sum() == 100
    # under budget -> duplicate padding
    step2 = proc._build_sample_points(as_cfg({'NUM_POINTS': {'train': 800}}))
    out2 = step2({'points': pts.copy()})['points']
    assert out2.shape == (800, 4)
    uniq = np.unique(out2, axis=0)
    assert len(uniq) == 500
