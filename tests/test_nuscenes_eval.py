"""nuScenes protocol implementation (`datasets/nuscenes/nuscenes_eval.py`):
analytic cases with hand-computable AP / TP errors / NDS (the devkit is not
installable here, so correctness is pinned by construction)."""
import numpy as np

from pdm_ssd_tpu.datasets.nuscenes.nuscenes_eval import (
    evaluate_nuscenes, _calc_ap, _match_class)


def _box(x, y, yaw=0.0, dims=(4.0, 2.0, 1.5)):
    return np.array([x, y, 0.0, *dims, yaw], np.float64)


def test_perfect_predictions_ap_one():
    gt = [{'name': np.array(['car', 'car']),
           'boxes_3d': np.stack([_box(10, 0), _box(30, 5)])}]
    pred = [{'name': np.array(['car', 'car']),
             'boxes_3d': np.stack([_box(10, 0), _box(30, 5)]),
             'score': np.array([0.9, 0.8])}]
    _s, m = evaluate_nuscenes(gt, pred, ['car'])
    assert abs(m['car_AP'] - 1.0) < 1e-6
    assert m['car_trans_err'] < 1e-6
    assert m['car_scale_err'] < 1e-6
    assert m['car_orient_err'] < 1e-6
    assert abs(m['NDS'] - 1.0) < 1e-6


def test_distance_threshold_gates_matching():
    gt = [{'name': np.array(['car']), 'boxes_3d': _box(10, 0)[None]}]
    # 1.5 m off: matches at 2 m and 4 m thresholds only -> AP = mean(0,0,1,1)/1
    pred = [{'name': np.array(['car']), 'boxes_3d': _box(10, 1.5)[None],
             'score': np.array([0.9])}]
    _s, m = evaluate_nuscenes(gt, pred, ['car'])
    assert abs(m['car_AP'] - 0.5) < 1e-6
    assert abs(m['car_trans_err'] - 1.5) < 1e-6


def test_false_positive_halves_precision():
    gt = [{'name': np.array(['car']), 'boxes_3d': _box(10, 0)[None]}]
    pred = [{'name': np.array(['car', 'car']),
             'boxes_3d': np.stack([_box(10, 0), _box(50, 20)]),
             'score': np.array([0.9, 0.95])}]   # FP scores HIGHER
    results = _match_class([[ _box(10, 0) ]], [(0, 0.9, _box(10, 0)),
                                               (0, 0.95, _box(50, 20))], 2.0)
    ap, rec, prec = _calc_ap(results, 1)
    # first (highest-score) pred is the FP -> precision at full recall = 0.5
    assert prec[-1] == 0.5
    assert ap < 0.5


def test_orientation_and_scale_errors():
    gt = [{'name': np.array(['car']),
           'boxes_3d': _box(10, 0, yaw=0.0, dims=(4, 2, 2))[None]}]
    pred = [{'name': np.array(['car']),
             'boxes_3d': _box(10, 0, yaw=np.pi / 4, dims=(4, 2, 1))[None],
             'score': np.array([0.9])}]
    _s, m = evaluate_nuscenes(gt, pred, ['car'])
    assert abs(m['car_orient_err'] - np.pi / 4) < 1e-6
    # aligned IoU of (4,2,2) vs (4,2,1): inter 8, union 16+8-8=16 -> 0.5
    assert abs(m['car_scale_err'] - 0.5) < 1e-6


def test_greedy_matching_consumes_gt_once():
    gt = [{'name': np.array(['car']), 'boxes_3d': _box(10, 0)[None]}]
    pred = [{'name': np.array(['car', 'car']),
             'boxes_3d': np.stack([_box(10, 0.1), _box(10, 0.2)]),
             'score': np.array([0.9, 0.8])}]
    _s, m = evaluate_nuscenes(gt, pred, ['car'])
    # one TP + one FP on a single gt
    assert m['car_AP'] < 1.0


def test_velocity_error_when_present():
    b = np.concatenate([_box(10, 0), [2.0, 0.0]])
    bp = np.concatenate([_box(10, 0), [1.0, 0.0]])
    gt = [{'name': np.array(['car']), 'boxes_3d': b[None]}]
    pred = [{'name': np.array(['car']), 'boxes_3d': bp[None],
             'score': np.array([0.9])}]
    _s, m = evaluate_nuscenes(gt, pred, ['car'])
    assert abs(m['car_vel_err'] - 1.0) < 1e-6
    assert 'mVELE' in m
