"""Waymo-protocol AP/APH (`datasets/waymo/waymo_eval.py`): analytic cases."""
import numpy as np

from pdm_ssd_tpu.datasets.waymo.waymo_eval import evaluate_waymo


def _box(x, y, yaw=0.0, dims=(4.6, 2.0, 1.8)):
    return np.array([x, y, 0.0, *dims, yaw], np.float64)


def test_perfect_predictions():
    gt = [{'name': np.array(['Vehicle', 'Vehicle']),
           'boxes_3d': np.stack([_box(10, 0), _box(30, 5)]),
           'num_points_in_gt': np.array([50, 3])}]   # second gt is LEVEL_2
    pred = [{'name': np.array(['Vehicle', 'Vehicle']),
             'boxes_3d': np.stack([_box(10, 0), _box(30, 5)]),
             'score': np.array([0.9, 0.8])}]
    _s, m = evaluate_waymo(gt, pred, ['Vehicle'])
    assert abs(m['Vehicle_L1_AP'] - 1.0) < 0.02
    assert abs(m['Vehicle_L2_AP'] - 1.0) < 0.02
    assert abs(m['Vehicle_L1_APH'] - 1.0) < 0.02


def test_heading_error_reduces_aph_not_ap():
    gt = [{'name': np.array(['Vehicle']), 'boxes_3d': _box(10, 0)[None],
           'num_points_in_gt': np.array([50])}]
    # same box, heading off by pi/2 -> square-ish overlap still > 0.7? No:
    # swap dims so IoU stays high under rotation
    b = _box(10, 0, yaw=np.pi, dims=(4.6, 2.0, 1.8))   # pi flip: IoU 1
    pred = [{'name': np.array(['Vehicle']), 'boxes_3d': b[None],
             'score': np.array([0.9])}]
    _s, m = evaluate_waymo(gt, pred, ['Vehicle'])
    assert abs(m['Vehicle_L1_AP'] - 1.0) < 0.02      # geometric match
    assert m['Vehicle_L1_APH'] < 0.05                # heading fully wrong


def test_level2_counts_low_point_gts():
    gt = [{'name': np.array(['Pedestrian', 'Pedestrian']),
           'boxes_3d': np.stack([_box(10, 0, dims=(0.9, 0.9, 1.7)),
                                 _box(20, 0, dims=(0.9, 0.9, 1.7))]),
           'num_points_in_gt': np.array([50, 2])}]
    pred = [{'name': np.array(['Pedestrian']),
             'boxes_3d': _box(10, 0, dims=(0.9, 0.9, 1.7))[None],
             'score': np.array([0.9])}]
    _s, m = evaluate_waymo(gt, pred, ['Pedestrian'])
    assert abs(m['Pedestrian_L1_AP'] - 1.0) < 0.02   # only the 50-pt gt in L1
    assert 0.3 < m['Pedestrian_L2_AP'] < 0.6         # 1 of 2 found in L2


def test_false_positive_penalized():
    gt = [{'name': np.array(['Vehicle']), 'boxes_3d': _box(10, 0)[None],
           'num_points_in_gt': np.array([50])}]
    pred = [{'name': np.array(['Vehicle', 'Vehicle']),
             'boxes_3d': np.stack([_box(10, 0), _box(50, 20)]),
             'score': np.array([0.8, 0.9])}]
    _s, m = evaluate_waymo(gt, pred, ['Vehicle'])
    assert m['Vehicle_L1_AP'] < 0.7
