"""Devkit-free nuScenes info creation (`datasets/nuscenes/nuscenes_info.py`)
on a fabricated raw-table mini dataset: global->lidar box transforms, sweep
transform chains, velocity from neighboring annotations."""
import json
import pickle

import numpy as np
import pytest

from pdm_ssd_tpu.datasets.nuscenes.nuscenes_info import (
    NuScenesTables, create_nuscenes_infos, quat_yaw, MINI_TRAIN)


def _yaw_quat(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


CAM_W, CAM_H, CAM_F = 192, 128, 80.0
# camera axes in ego frame: x_cam = -y_ego, y_cam = -z_ego, z_cam = +x_ego
CAM_R = np.array([[0., 0., 1.], [-1., 0., 0.], [0., -1., 0.]])
CAM_T = [0.5, 0.0, 1.6]


def _cam_image(root, fname, dots_uv):
    """Gray PNG with a bright dot at each (u, v) — landmark pixels whose
    location is predictable from the camera geometry."""
    from PIL import Image
    img = np.full((CAM_H, CAM_W, 3), 50, np.uint8)
    for u, v in dots_uv:
        ui, vi = int(round(u)), int(round(v))
        if 3 <= ui < CAM_W - 3 and 3 <= vi < CAM_H - 3:
            img[vi - 3:vi + 4, ui - 3:ui + 4] = 255
    (root / fname).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(img).save(str(root / fname))


def _write_tables(root, ego_xy=(5.0, 2.0), ego_yaw=0.3, with_cams=False,
                  lidar_points=None):
    v = root / 'v1.0-mini'
    v.mkdir(parents=True)
    (root / 'sweeps').mkdir()

    def dump(name, recs):
        (v / f'{name}.json').write_text(json.dumps(recs))

    sensors = [{'token': 'sen1', 'channel': 'LIDAR_TOP', 'modality': 'lidar'}]
    cal = [{'token': 'cs1', 'sensor_token': 'sen1',
            'translation': [0, 0, 1.8], 'rotation': [1, 0, 0, 0]}]
    if with_cams:
        from pdm_ssd_tpu.datasets.nuscenes.nuscenes_info import _rot_to_quat
        sensors.append({'token': 'senc', 'channel': 'CAM_FRONT',
                        'modality': 'camera'})
        cal.append({'token': 'csc', 'sensor_token': 'senc',
                    'translation': CAM_T,
                    'rotation': list(_rot_to_quat(CAM_R)),
                    'camera_intrinsic': [[CAM_F, 0, CAM_W / 2],
                                         [0, CAM_F, CAM_H / 2], [0, 0, 1]]})
    dump('sensor', sensors)
    dump('calibrated_sensor', cal)
    samples, sds, egos, anns = [], [], [], []
    n = 3
    for i in range(n):
        ts = 1_000_000_000_000 + i * 500_000          # 0.5 s apart
        samples.append({'token': f's{i}', 'timestamp': ts,
                        'scene_token': 'sc0',
                        'prev': f's{i-1}' if i else '',
                        'next': f's{i+1}' if i < n - 1 else ''})
        egos.append({'token': f'ego{i}', 'timestamp': ts,
                     'translation': [ego_xy[0], ego_xy[1], 0.0],
                     'rotation': _yaw_quat(ego_yaw)})
        fname = f'sweeps/lidar_{i}.bin'
        if lidar_points is not None:
            pts = lidar_points(i)
        else:
            pts = np.random.RandomState(i).rand(50, 5).astype(np.float32)
        (root / fname).write_bytes(pts.tobytes())
        sds.append({'token': f'sd{i}', 'sample_token': f's{i}',
                    'calibrated_sensor_token': 'cs1',
                    'ego_pose_token': f'ego{i}', 'timestamp': ts,
                    'is_key_frame': True, 'filename': fname,
                    'prev': f'sd{i-1}' if i else '', 'next': ''})
        if with_cams:
            # project the gt box center into the camera for the landmark dot
            c, s = np.cos(-ego_yaw), np.sin(-ego_yaw)
            gx, gy = 20.0 + 1.0 * i - ego_xy[0], 5.0 - ego_xy[1]
            p_lidar = np.array([gx * c - gy * s, gx * s + gy * c, 0.5 - 1.8])
            p_cam = CAM_R.T @ (p_lidar + [0, 0, 1.8]
                               - np.asarray(CAM_T, np.float64))
            u = CAM_F * p_cam[0] / p_cam[2] + CAM_W / 2
            vv = CAM_F * p_cam[1] / p_cam[2] + CAM_H / 2
            img_name = f'samples/cam_front_{i}.png'
            _cam_image(root, img_name, [(u, vv)])
            sds.append({'token': f'sdc{i}', 'sample_token': f's{i}',
                        'calibrated_sensor_token': 'csc',
                        'ego_pose_token': f'ego{i}', 'timestamp': ts,
                        'is_key_frame': True, 'filename': img_name,
                        'prev': '', 'next': ''})
        # one moving car: global position advances 1 m/sample in x
        anns.append({'token': f'a{i}', 'sample_token': f's{i}',
                     'instance_token': 'inst0',
                     'translation': [20.0 + 1.0 * i, 5.0, 0.5],
                     'size': [1.9, 4.5, 1.6],        # (w, l, h)
                     'rotation': _yaw_quat(1.0),
                     'num_lidar_pts': 17,
                     'prev': f'a{i-1}' if i else '',
                     'next': f'a{i+1}' if i < n - 1 else ''})
    dump('sample', samples)
    dump('sample_data', sds)
    dump('ego_pose', egos)
    dump('sample_annotation', anns)
    dump('instance', [{'token': 'inst0', 'category_token': 'cat0'}])
    dump('category', [{'token': 'cat0', 'name': 'vehicle.car'}])
    dump('scene', [{'token': 'sc0', 'name': MINI_TRAIN[0],
                    'first_sample_token': 's0'}])
    return root


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
