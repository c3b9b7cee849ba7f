"""Dataset registry breadth + the Lyft IoU-averaged mAP metric."""
import numpy as np

from pdm_ssd_tpu.datasets.lyft.lyft_dataset import lyft_map


def _box(x, y, yaw=0.0, dims=(4.0, 2.0, 1.5)):
    return np.array([x, y, 0.0, *dims, yaw], np.float64)


def test_registry_has_all_reference_datasets():
    import pdm_ssd_tpu.datasets as d
    for name in ['KittiDataset', 'NuScenesDataset', 'WaymoDataset',
                 'ONCEDataset', 'LyftDataset', 'PandasetDataset',
                 'Argo2Dataset', 'CustomDataset']:
        assert hasattr(d, name), name


def test_lyft_map_perfect_is_one():
    gt = [{'name': np.array(['car', 'car']),
           'boxes_3d': np.stack([_box(10, 0), _box(30, 5)])}]
    pred = [{'name': np.array(['car', 'car']),
             'boxes_3d': np.stack([_box(10, 0), _box(30, 5)]),
             'score': np.array([0.9, 0.8])}]
    _s, m = lyft_map(gt, pred, ['car'])
    assert abs(m['car_AP'] - 1.0) < 0.02  # 101-pt interpolation granularity


def test_lyft_map_iou_threshold_average():
    gt = [{'name': np.array(['car']), 'boxes_3d': _box(10, 0)[None]}]
    # shifted copy: IoU ~0.57 -> matches only the low thresholds
    pred = [{'name': np.array(['car']),
             'boxes_3d': _box(10.7, 0)[None], 'score': np.array([0.9])}]
    _s, m = lyft_map(gt, pred, ['car'])
    assert 0.05 < m["car_AP"] <= 0.55  # IoU 0.70 matches thresholds 0.5..0.70


def test_lyft_map_false_positives_reduce_ap():
    gt = [{'name': np.array(['car']), 'boxes_3d': _box(10, 0)[None]}]
    pred = [{'name': np.array(['car', 'car']),
             'boxes_3d': np.stack([_box(10, 0), _box(50, 20)]),
             'score': np.array([0.8, 0.9])}]
    _s, m = lyft_map(gt, pred, ['car'])
    assert m['car_AP'] < 0.6
