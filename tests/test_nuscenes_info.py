"""Devkit-free nuScenes info creation (`datasets/nuscenes/nuscenes_info.py`)
on a fabricated raw-table mini dataset: global->lidar box transforms, sweep
transform chains, velocity from neighboring annotations."""
import json
import pickle

import numpy as np
import pytest

from pdm_ssd_tpu.datasets.nuscenes.nuscenes_info import (
    NuScenesTables, create_nuscenes_infos, quat_yaw, MINI_TRAIN)


# table fabrication lives in the package now (datasets/nuscenes/
# synthetic.py) so the CLI mini-set generator and these tests share it
from pdm_ssd_tpu.datasets.nuscenes.synthetic import (  # noqa: F401
    CAM_W, CAM_H, CAM_F, CAM_R, CAM_T, write_tables as _write_tables)


def test_create_infos_box_transform_and_velocity(tmp_path):
    ego_xy, ego_yaw = (5.0, 2.0), 0.3
    root = _write_tables(tmp_path, ego_xy, ego_yaw)
    out = create_nuscenes_infos(root, 'v1.0-mini', max_sweeps=3)
    n, path = out['train']
    assert n == 3
    infos = pickle.loads((tmp_path / path).read_bytes()
                         if not str(path).startswith('/') else
                         open(path, 'rb').read())
    info = infos[0]
    assert info['gt_names'].tolist() == ['car']
    box = info['gt_boxes'][0]
    # expected: global -> ego/lidar (rotation -yaw, translation)
    c, s = np.cos(-ego_yaw), np.sin(-ego_yaw)
    gx, gy = 20.0 - ego_xy[0], 5.0 - ego_xy[1]
    np.testing.assert_allclose(box[0], gx * c - gy * s, atol=1e-5)
    np.testing.assert_allclose(box[1], gx * s + gy * c, atol=1e-5)
    np.testing.assert_allclose(box[2], 0.5 - 1.8, atol=1e-5)
    # dims ordered (l, w, h)
    np.testing.assert_allclose(box[3:6], [4.5, 1.9, 1.6], atol=1e-6)
    np.testing.assert_allclose(box[6], 1.0 - ego_yaw, atol=1e-5)
    # velocity: 1 m / 0.5 s = 2 m/s global +x -> rotated into lidar frame
    np.testing.assert_allclose(box[7], 2 * c, atol=1e-4)
    np.testing.assert_allclose(box[8], 2 * -np.sin(ego_yaw), atol=1e-4)

    # sweeps: sample 2 should carry 2 prior sweeps with identity-ish chains
    info2 = infos[2]
    assert len(info2['sweeps']) == 2
    tm = info2['sweeps'][0]['transform_matrix']
    np.testing.assert_allclose(tm, np.eye(4), atol=1e-6)  # static ego
    assert info2['sweeps'][0]['time_lag'] > 0


def test_dataset_loads_created_infos(tmp_path):
    root = _write_tables(tmp_path)
    create_nuscenes_infos(root, 'v1.0-mini', max_sweeps=3)
    from pdm_ssd_tpu.datasets.nuscenes.nuscenes_dataset import NuScenesDataset
    from pdm_ssd_tpu.utils.config import CfgNode
    cfg = CfgNode({
        'DATA_PATH': str(root), 'VERSION': '',
        'INFO_PATH': {'train': ['nuscenes_infos_3sweeps_train.pkl'],
                      'test': ['nuscenes_infos_3sweeps_val.pkl']},
        'MAX_SWEEPS': 3,
        'POINT_CLOUD_RANGE': [-50, -50, -5, 50, 50, 3],
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
            'src_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp']},
        'DATA_PROCESSOR': [], 'MAX_GT_BOXES': 8,
    })
    ds = NuScenesDataset(cfg, class_names=['car'], training=False,
                         root_path=root)
    assert len(ds) == 0 or len(ds) == 3  # val split empty for this scene
