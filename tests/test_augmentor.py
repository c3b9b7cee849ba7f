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


# ---- local / frustum / pyramid augmentations (round 2) ----------------------
from pdm_ssd_tpu.datasets.augmentor import augmentor_utils  # noqa: E402

def _scene(rng, n_boxes=3, n_pts=400):
    boxes = np.zeros((n_boxes, 7), np.float32)
    boxes[:, 0] = rng.uniform(10, 50, n_boxes)
    boxes[:, 1] = rng.uniform(-20, 20, n_boxes)
    boxes[:, 2] = -1.0
    boxes[:, 3:6] = [3.9, 1.6, 1.56]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
    pts = []
    for b in boxes:
        local = rng.uniform(-0.45, 0.45, (60, 3)) * b[3:6]
        c, s = np.cos(b[6]), np.sin(b[6])
        gx = local[:, 0] * c - local[:, 1] * s + b[0]
        gy = local[:, 0] * s + local[:, 1] * c + b[1]
        pts.append(np.stack([gx, gy, local[:, 2] + b[2], np.ones(60)], 1))
    bg = np.stack([rng.uniform(0, 70, n_pts), rng.uniform(-40, 40, n_pts),
                   rng.uniform(-2, 0.5, n_pts), np.ones(n_pts)], 1)
    return boxes, np.concatenate(pts + [bg]).astype(np.float32)


def test_local_translation_moves_points_with_boxes():
    rng = np.random.RandomState(0)
    np.random.seed(0)
    boxes, pts = _scene(rng)
    owner0, _ = augmentor_utils.points_box_assignment(pts, boxes)
    b2, p2 = augmentor_utils.local_translation(boxes.copy(), pts.copy(), [0.5, 1.5])
    # box points moved with their box: membership preserved
    owner1, _ = augmentor_utils.points_box_assignment(p2, b2)
    assert (owner1[:180] == owner0[:180]).mean() > 0.95
    # boxes actually moved
    assert np.abs(b2[:, :3] - boxes[:, :3]).max() >= 0.5


def test_local_rotation_preserves_membership():
    rng = np.random.RandomState(1)
    np.random.seed(1)
    boxes, pts = _scene(rng)
    b2, p2 = augmentor_utils.local_rotation(boxes.copy(), pts.copy(), [0.3, 0.6])
    owner1, _ = augmentor_utils.points_box_assignment(p2, b2)
    owner0, _ = augmentor_utils.points_box_assignment(pts, boxes)
    assert (owner1[:180] == owner0[:180]).mean() > 0.95
    assert np.abs(b2[:, 6] - boxes[:, 6]).min() >= 0.3 - 1e-6


def test_local_scaling_scales_dims():
    rng = np.random.RandomState(2)
    np.random.seed(2)
    boxes, pts = _scene(rng)
    b2, p2 = augmentor_utils.local_scaling(boxes.copy(), pts.copy(), [1.1, 1.2])
    assert (b2[:, 3:6] >= boxes[:, 3:6] * 1.1 - 1e-5).all()
    owner1, _ = augmentor_utils.points_box_assignment(p2, b2)
    owner0, _ = augmentor_utils.points_box_assignment(pts, boxes)
    assert (owner1[:180] == owner0[:180]).mean() > 0.9


def test_global_frustum_dropout_drops_top():
    rng = np.random.RandomState(3)
    np.random.seed(3)
    boxes, pts = _scene(rng)
    b2, p2 = augmentor_utils.global_frustum_dropout(
        boxes.copy(), pts.copy(), [0.2, 0.2], 'top')
    assert len(p2) < len(pts)
    zmax, zmin = pts[:, 2].max(), pts[:, 2].min()
    assert p2[:, 2].max() < zmax - 0.2 * (zmax - zmin) + 1e-6


def test_local_frustum_dropout_only_in_box():
    rng = np.random.RandomState(4)
    np.random.seed(4)
    boxes, pts = _scene(rng)
    owner0, _ = augmentor_utils.points_box_assignment(pts, boxes)
    n_bg = (owner0 == -1).sum()
    b2, p2 = augmentor_utils.local_frustum_dropout(
        boxes.copy(), pts.copy(), [0.4, 0.5], 'top')
    owner1, _ = augmentor_utils.points_box_assignment(p2, b2)
    assert (owner1 == -1).sum() == n_bg         # background untouched
    assert len(p2) < len(pts)                    # some box points dropped


def test_pyramid_dropout_and_sparsify():
    rng = np.random.RandomState(5)
    np.random.seed(5)
    boxes, pts = _scene(rng)
    b2, p2, pyr = augmentor_utils.local_pyramid_dropout(
        boxes.copy(), pts.copy(), dropout_prob=1.0)
    assert len(p2) < len(pts)
    assert pyr.shape == (3, 6, 5, 3)
    b3, p3, _ = augmentor_utils.local_pyramid_sparsify(
        boxes.copy(), pts.copy(), prob=1.0, max_num_pts=2)
    assert len(p3) < len(pts)


def test_pyramid_swap_runs_and_keeps_counts_sane():
    rng = np.random.RandomState(6)
    np.random.seed(6)
    boxes, pts = _scene(rng)
    b2, p2 = augmentor_utils.local_pyramid_swap(
        boxes.copy(), pts.copy(), prob=1.0, max_num_pts=50)
    assert np.isfinite(p2).all()
    assert len(p2) <= len(pts) + 3 * 50


def test_points_in_pyramids_mask_is_inside_box():
    rng = np.random.RandomState(7)
    np.random.seed(7)
    boxes, pts = _scene(rng, n_boxes=1)
    pyr = augmentor_utils.get_pyramids(boxes)        # (1, 6, 5, 3)
    masks = augmentor_utils.points_in_pyramids_mask(pts, pyr.reshape(-1, 5, 3))
    owner, _ = augmentor_utils.points_box_assignment(pts, boxes)
    in_box = owner == 0
    # every box point belongs to exactly one of the 6 pyramids (up to boundary)
    counts = masks[in_box].sum(1)
    assert (counts >= 1).mean() > 0.98
    # non-box points far away are in no pyramid
    far = np.linalg.norm(pts[:, :2] - boxes[0, :2], axis=1) > 5
    assert masks[far].sum() == 0


def test_data_augmentor_queue_with_new_augs():
    from pdm_ssd_tpu.datasets.augmentor.data_augmentor import DataAugmentor
    from pdm_ssd_tpu.utils.config import CfgNode
    np.random.seed(8)
    cfgs = [
        CfgNode({'NAME': 'random_local_translation', 'ALONG_AXIS_LIST': ['x', 'y'],
                 'LOCAL_TRANSLATION_RANGE': [-0.2, 0.2]}),
        CfgNode({'NAME': 'random_local_rotation', 'LOCAL_ROT_ANGLE': [-0.15, 0.15]}),
        CfgNode({'NAME': 'random_local_scaling', 'LOCAL_SCALE_RANGE': [0.95, 1.05]}),
        CfgNode({'NAME': 'random_world_frustum_dropout',
                 'DIRECTION': ['top'], 'INTENSITY_RANGE': [0.05, 0.1]}),
        CfgNode({'NAME': 'random_local_frustum_dropout',
                 'DIRECTION': ['top'], 'INTENSITY_RANGE': [0.05, 0.1]}),
        CfgNode({'NAME': 'random_local_pyramid_aug', 'DROP_PROB': 0.2,
                 'SPARSIFY_PROB': 0.2, 'SPARSIFY_MAX_NUM': 50,
                 'SWAP_PROB': 0.2, 'SWAP_MAX_NUM': 50}),
    ]
    aug = DataAugmentor(root_path=None, augmentor_configs=cfgs, class_names=['Car'])
    rng = np.random.RandomState(8)
    boxes, pts = _scene(rng)
    out = aug.forward({'gt_boxes': boxes, 'points': pts})
    assert out['gt_boxes'].shape[1] == 7
    assert np.isfinite(out['points']).all()


def test_gt_sampler_shared_memory_db(tmp_path, rng):
    import pickle
    """USE_SHARED_MEMORY: crops come from the memory-mapped stacked DB
    (`database_sampler.py:84-99` analog) via global_data_offset slices."""
    from pdm_ssd_tpu.datasets.augmentor.database_sampler import DataBaseSampler
    from pdm_ssd_tpu.utils.config import CfgNode
    # build a stacked db: two crops of a Car
    crop1 = rng.randn(20, 4).astype(np.float32) * 0.3
    crop2 = rng.randn(15, 4).astype(np.float32) * 0.3
    stacked = np.concatenate([crop1, crop2]).reshape(-1)
    np.save(tmp_path / 'gt_database_data.npy', stacked.reshape(-1, 4))
    infos = {'Car': [
        {'name': 'Car', 'path': 'missing1.bin', 'difficulty': 0,
         'num_points_in_gt': 20, 'global_data_offset': (0, 20),
         'box3d_lidar': np.array([10, 0, -1, 4, 2, 1.6, 0.0], np.float32)},
        {'name': 'Car', 'path': 'missing2.bin', 'difficulty': 0,
         'num_points_in_gt': 15, 'global_data_offset': (20, 35),
         'box3d_lidar': np.array([20, 5, -1, 4, 2, 1.6, 0.5], np.float32)},
    ]}
    with open(tmp_path / 'dbinfos.pkl', 'wb') as f:
        pickle.dump(infos, f)
    cfg = CfgNode({'DB_INFO_PATH': ['dbinfos.pkl'],
                   'DB_DATA_PATH': ['gt_database_data.npy'],
                   'USE_SHARED_MEMORY': True,
                   'SAMPLE_GROUPS': ['Car:2'],
                   'NUM_POINT_FEATURES': 4})
    sampler = DataBaseSampler(tmp_path, cfg, ['Car'])
    assert sampler.db_data is not None
    dd = {'points': rng.uniform(-50, 50, (100, 4)).astype(np.float32),
          'gt_boxes': np.zeros((0, 7), np.float32),
          'gt_names': np.array([], dtype='<U8')}
    out = sampler(dd)
    assert len(out['gt_boxes']) == 2          # both pasted from shm slices
    assert (out['gt_names'] == 'Car').all()
    # pasted points are centered at the boxes
    near1 = np.abs(out['points'][:, :3] - [10, 0, -1]).max(-1) < 2.5
    assert near1.sum() >= 15
