"""KITTI AP evaluator sanity tests: perfect predictions -> 100 AP, misses and
false positives lower it; numpy rotated IoU matches the JAX kernel."""
import numpy as np

from pdm_ssd_tpu.datasets.kitti import eval as kitti_eval
from pdm_ssd_tpu.utils import np_iou
from pdm_ssd_tpu.ops import iou3d


def make_anno(locs, dims, rots, names, scores=None, height=50):
    n = len(names)
    bbox = np.zeros((n, 4))
    bbox[:, 2] = 100
    bbox[:, 3] = height  # tall enough for 'easy'
    anno = {
        'name': np.array(names),
        'truncated': np.zeros(n),
        'occluded': np.zeros(n),
        'alpha': np.zeros(n),
        'bbox': bbox,
        'dimensions': np.array(dims).reshape(-1, 3),
        'location': np.array(locs).reshape(-1, 3),
        'rotation_y': np.array(rots),
    }
    if scores is not None:
        anno['score'] = np.array(scores)
    return anno


def test_perfect_predictions_ap100():
    gt_annos, dt_annos = [], []
    rs = np.random.RandomState(0)
    for i in range(10):
        n = 6
        locs = rs.uniform(-10, 10, (n, 3))
        locs[:, 2] = rs.uniform(5, 40, n)
        dims = np.tile([3.9, 1.56, 1.6], (n, 1))  # l, h, w
        rots = rs.uniform(-np.pi, np.pi, n)
        gt_annos.append(make_anno(locs, dims, rots, ['Car'] * n))
        dt_annos.append(make_anno(locs, dims, rots, ['Car'] * n,
                                  scores=rs.uniform(0.5, 1.0, n)))
    result, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, ['Car'])
    assert ret['Car_3d/easy_R40'] > 99.0, result
    assert ret['Car_bev/moderate_R40'] > 99.0, result


def test_missed_gt_lowers_ap():
    gt_annos, dt_annos = [], []
    rs = np.random.RandomState(1)
    for i in range(10):
        n = 6
        locs = rs.uniform(-10, 10, (n, 3))
        locs[:, 2] = rs.uniform(5, 40, n)
        dims = np.tile([3.9, 1.56, 1.6], (n, 1))
        rots = rs.uniform(-np.pi, np.pi, n)
        gt_annos.append(make_anno(locs, dims, rots, ['Car'] * n))
        # predict only half of them
        dt_annos.append(make_anno(locs[:3], dims[:3], rots[:3], ['Car'] * 3,
                                  scores=rs.uniform(0.5, 1.0, 3)))
    _, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, ['Car'])
    assert ret['Car_3d/easy_R40'] < 60.0


def test_np_iou_matches_jax(rng):
    boxes_a = np.stack([
        rng.uniform(-5, 5, 12), rng.uniform(-5, 5, 12), np.zeros(12),
        rng.uniform(1, 5, 12), rng.uniform(1, 5, 12), np.ones(12) * 2,
        rng.uniform(-np.pi, np.pi, 12)], axis=1).astype(np.float32)
    boxes_b = np.stack([
        rng.uniform(-5, 5, 9), rng.uniform(-5, 5, 9), np.zeros(9),
        rng.uniform(1, 5, 9), rng.uniform(1, 5, 9), np.ones(9) * 2,
        rng.uniform(-np.pi, np.pi, 9)], axis=1).astype(np.float32)
    got_np = np_iou.boxes_bev_overlap_cpu(boxes_a, boxes_b)
    got_jax = np.asarray(iou3d.boxes_overlap_bev(boxes_a, boxes_b))
    np.testing.assert_allclose(got_np, got_jax, rtol=1e-3, atol=1e-3)
