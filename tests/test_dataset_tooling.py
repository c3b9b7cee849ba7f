"""Lyft / Pandaset / Argo2 info creators and raw parsing (VERDICT r2 missing
#8), on fabricated raw trees, plus a brute-force fuzz of the Lyft
competition mAP."""
import gzip
import json
import pickle

import numpy as np
import pytest

from pdm_ssd_tpu.utils.config import CfgNode


# ---------------- pandaset ----------------

def _make_pandaset_tree(tmp_path, rng, seq='001', n_frames=2, n_pts=300):
    import pandas as pd
    seq_dir = tmp_path / 'dataset' / seq
    (seq_dir / 'lidar').mkdir(parents=True)
    (seq_dir / 'annotations' / 'cuboids').mkdir(parents=True)
    poses = []
    for i in range(n_frames):
        # ego at (5*i, 2, 1), yawed 30 deg about z
        th = np.pi / 6
        poses.append({'position': {'x': 5.0 * i, 'y': 2.0, 'z': 1.0},
                      'heading': {'w': np.cos(th / 2), 'x': 0.0, 'y': 0.0,
                                  'z': np.sin(th / 2)}})
        pts = pd.DataFrame({
            'x': rng.uniform(-20, 20, n_pts) + 5.0 * i,
            'y': rng.uniform(-20, 20, n_pts),
            'z': rng.uniform(0, 3, n_pts),
            'i': rng.uniform(0, 255, n_pts),
            't': np.zeros(n_pts), 'd': np.zeros(n_pts, np.int64)})
        pts.to_pickle(seq_dir / 'lidar' / f'{i:02d}.pkl.gz')
        cub = pd.DataFrame({
            'position.x': [5.0 * i + 8.0], 'position.y': [2.0],
            'position.z': [1.5], 'dimensions.x': [2.0],
            'dimensions.y': [4.5], 'dimensions.z': [1.7],
            'yaw': [0.4], 'label': ['Car'],
            'cuboids.sensor_id': [-1]})
        cub.to_pickle(seq_dir / 'annotations' / 'cuboids' / f'{i:02d}.pkl.gz')
    (seq_dir / 'lidar' / 'poses.json').write_text(json.dumps(poses))
    return seq


def test_pandaset_raw_pipeline(tmp_path, rng):
    from pdm_ssd_tpu.datasets.pandaset import pandaset_utils as pu
    from pdm_ssd_tpu.datasets.pandaset.pandaset_dataset import PandasetDataset
    seq = _make_pandaset_tree(tmp_path, rng)
    infos = pu.get_infos(tmp_path, [seq])
    assert len(infos) == 2
    info_path = tmp_path / 'pandaset_infos_train.pkl'
    with open(info_path, 'wb') as f:
        pickle.dump(infos, f)
    cfg = CfgNode({
        'DATA_PATH': str(tmp_path),
        'INFO_PATH': {'train': ['pandaset_infos_train.pkl'],
                      'test': ['pandaset_infos_train.pkl']},
        'POINT_CLOUD_RANGE': [-50, -50, -3, 50, 50, 5],
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity'],
            'src_feature_list': ['x', 'y', 'z', 'intensity']},
        'DATA_PROCESSOR': [],
    })
    ds = PandasetDataset(dataset_cfg=cfg, class_names=['Car'], training=False,
                         root_path=tmp_path)
    dd = ds[0]
    assert dd['points'].shape[1] == 4
    assert dd['points'][:, 3].max() <= 1.0 + 1e-6      # intensity normalized
    assert dd['gt_boxes'].shape[0] == 1
    # ego-frame box: world (8, 0) offset from ego, rotated by -30 deg then
    # axis-swapped; verify the center radius is preserved
    world_off = np.array([8.0, 0.0, 0.5])
    got = dd['gt_boxes'][0]
    np.testing.assert_allclose(np.linalg.norm(got[:3]),
                               np.linalg.norm(world_off), rtol=1e-5)
    # dims swapped: normative dx = pandaset dimensions.y
    np.testing.assert_allclose(got[3:6], [4.5, 2.0, 1.7], rtol=1e-6)
    # points-in-box consistency: the box yaw transform is self-consistent
    _s, metrics = ds.evaluation(
        [{'name': np.array(['Car']), 'boxes_3d': got[None, :7],
          'score': np.array([0.9])},
         {'name': np.array(['Car']),
          'boxes_3d': np.asarray(ds[1]['gt_boxes'])[:, :7],
          'score': np.array([0.9])}], ['Car'])
    assert metrics['Car_AP'] > 0.99                    # perfect predictions


# ---------------- lyft ----------------

def _make_lyft_tables(tmp_path, rng, n_samples=2):
    v = tmp_path / 'trainval'
    v.mkdir()
    def w(name, recs):
        (v / f'{name}.json').write_text(json.dumps(recs))
    samples = []
    sample_data = []
    ego_pose = [{'token': 'ep0', 'translation': [0, 0, 0],
                 'rotation': [1, 0, 0, 0], 'timestamp': 0}]
    calib = [{'token': 'cs0', 'translation': [0, 0, 1.8],
              'rotation': [1, 0, 0, 0], 'sensor_token': 'sens0'}]
    anns = []
    insts = []
    for i in range(n_samples):
        tok = f's{i}'
        samples.append({'token': tok, 'timestamp': i * 500000,
                        'next': f's{i+1}' if i + 1 < n_samples else '',
                        'prev': f's{i-1}' if i else '',
                        'scene_token': 'sc0'})
        sample_data.append({'token': f'sd{i}', 'sample_token': tok,
                            'calibrated_sensor_token': 'cs0',
                            'ego_pose_token': 'ep0', 'is_key_frame': True,
                            'filename': f'lidar/{i}.bin',
                            'timestamp': i * 500000, 'prev': '', 'next': ''})
        anns.append({'token': f'a{i}', 'sample_token': tok,
                     'instance_token': 'inst0',
                     'translation': [10.0 + i, 5.0, 0.5],
                     'size': [2.0, 4.6, 1.7],   # w, l, h
                     'rotation': [1, 0, 0, 0], 'num_lidar_pts': 25,
                     'prev': '', 'next': ''})
    insts.append({'token': 'inst0', 'category_token': 'cat0'})
    w('sample', samples)
    w('sample_data', sample_data)
    w('ego_pose', ego_pose)
    w('calibrated_sensor', calib)
    w('sample_annotation', anns)
    w('instance', insts)
    w('category', [{'token': 'cat0', 'name': 'car'}])
    w('scene', [{'token': 'sc0', 'name': 'scene-0',
                 'first_sample_token': 's0'}])
    w('sensor', [{'token': 'sens0', 'channel': 'LIDAR_TOP'}])


def test_lyft_info_creator(tmp_path, rng):
    from pdm_ssd_tpu.datasets.lyft.lyft_utils import create_lyft_infos
    _make_lyft_tables(tmp_path, rng)
    create_lyft_infos(tmp_path, tmp_path, version='trainval',
                      train_scenes=['scene-0'], val_scenes=[])
    infos = pickle.load(open(tmp_path / 'lyft_infos_train.pkl', 'rb'))
    assert len(infos) == 2
    assert infos[0]['gt_names'].tolist() == ['car']
    np.testing.assert_allclose(infos[0]['gt_boxes'][0, :3],
                               [10.0, 5.0, 0.5 - 1.8], atol=1e-6)
    # lwh ordering: l=4.6, w=2.0
    np.testing.assert_allclose(infos[0]['gt_boxes'][0, 3:6],
                               [4.6, 2.0, 1.7], atol=1e-6)


def test_lyft_map_fuzz(rng):
    """Brute-force re-derivation of the Lyft competition mAP on random
    scenes (per-threshold greedy matching in score order)."""
    from pdm_ssd_tpu.datasets.lyft.lyft_dataset import lyft_map, _iou3d
    for trial in range(50):
        gt, pred = [], []
        for _f in range(2):
            ng, npr = rng.randint(0, 4), rng.randint(0, 5)
            gb = np.stack([[rng.uniform(0, 30), rng.uniform(-10, 10),
                            0, 4, 2, 1.6, rng.uniform(-3, 3)]
                           for _ in range(ng)]) if ng else np.zeros((0, 7))
            pb = []
            for _ in range(npr):
                if ng and rng.rand() < 0.7:
                    b = gb[rng.randint(ng)].copy()
                    b[:2] += rng.randn(2) * 0.5
                    pb.append(b)
                else:
                    pb.append([rng.uniform(0, 30), rng.uniform(-10, 10), 0,
                               4, 2, 1.6, 0])
            pb = np.asarray(pb) if npr else np.zeros((0, 7))
            gt.append({'name': np.array(['car'] * ng), 'boxes_3d': gb})
            pred.append({'name': np.array(['car'] * npr), 'boxes_3d': pb,
                         'score': rng.rand(npr)})
        _s, got = lyft_map(gt, pred, ['car'])
        # brute force
        thrs = np.arange(0.5, 1.0, 0.05)
        aps = []
        for thr in thrs:
            rows = []
            n_gt = 0
            for g, p in zip(gt, pred):
                n_gt += len(g['boxes_3d'])
                iou = _iou3d(g['boxes_3d'], p['boxes_3d']) \
                    if len(g['boxes_3d']) and len(p['boxes_3d']) else \
                    np.zeros((len(g['boxes_3d']), len(p['boxes_3d'])))
                taken = set()
                for j in sorted(range(len(p['boxes_3d'])),
                                key=lambda j: -p['score'][j]):
                    best, bi = -1.0, -1
                    for gi in range(len(g['boxes_3d'])):
                        if gi in taken:
                            continue
                        if iou[gi, j] > best:
                            best, bi = iou[gi, j], gi
                    if bi >= 0 and best > thr:
                        taken.add(bi)
                        rows.append((p['score'][j], 1))
                    else:
                        rows.append((p['score'][j], 0))
            if n_gt == 0:
                continue
            rows.sort(key=lambda r: -r[0])
            ap = 0.0
            for r in np.linspace(0, 1, 101):
                tp = fp = 0
                best_p = 0.0
                for (_s2, is_tp) in rows:
                    tp += is_tp
                    fp += 1 - is_tp
                    if tp / n_gt >= r:
                        best_p = max(best_p, tp / (tp + fp))
                ap += best_p / 101
            aps.append(ap)
        want = float(np.mean(aps)) if aps else 0.0
        assert abs(got['car_AP'] - want) < 1e-9, (trial, got['car_AP'], want)


# ---------------- argo2 ----------------

def test_argo2_feather_pipeline(tmp_path, rng):
    pd = pytest.importorskip('pandas')
    try:
        pd.DataFrame({'x': [1.0]}).to_feather(tmp_path / 'probe.feather')
    except Exception:
        pytest.skip('no feather engine available')
    from pdm_ssd_tpu.datasets.argo2.argo2_utils import (
        create_argo2_infos, quat_to_yaw)
    log = 'log0'
    d = tmp_path / 'train' / log / 'sensors' / 'lidar'
    d.mkdir(parents=True)
    for ts in (1000, 2000):
        pd.DataFrame({
            'x': rng.uniform(-30, 30, 200), 'y': rng.uniform(-30, 30, 200),
            'z': rng.uniform(-2, 3, 200),
            'intensity': rng.uniform(0, 255, 200)}).to_feather(
                d / f'{ts}.feather')
    yaw = 0.7
    pd.DataFrame({
        'timestamp_ns': [1000, 2000], 'track_uuid': ['t0', 't0'],
        'category': ['REGULAR_VEHICLE', 'REGULAR_VEHICLE'],
        'length_m': [4.5, 4.5], 'width_m': [2.0, 2.0],
        'height_m': [1.7, 1.7],
        'qw': [np.cos(yaw / 2)] * 2, 'qx': [0.0] * 2, 'qy': [0.0] * 2,
        'qz': [np.sin(yaw / 2)] * 2,
        'tx_m': [10.0, 12.0], 'ty_m': [5.0, 5.0], 'tz_m': [0.5, 0.5],
        'num_interior_pts': [30, 28]}).to_feather(
            tmp_path / 'train' / log / 'annotations.feather')
    create_argo2_infos(tmp_path, tmp_path, splits=('train',))
    infos = pickle.load(open(tmp_path / 'argo2_infos_train.pkl', 'rb'))
    assert len(infos) == 2
    assert infos[0]['gt_names'].tolist() == ['REGULAR_VEHICLE']
    np.testing.assert_allclose(infos[0]['gt_boxes'][0],
                               [10, 5, 0.5, 4.5, 2.0, 1.7, yaw], rtol=1e-6)
    # dataset consumes the feather lidar path
    from pdm_ssd_tpu.datasets.argo2.argo2_dataset import Argo2Dataset
    cfg = CfgNode({
        'DATA_PATH': str(tmp_path / 'train'),
        'INFO_PATH': {'train': ['../argo2_infos_train.pkl'],
                      'test': ['../argo2_infos_train.pkl']},
        'POINT_CLOUD_RANGE': [-50, -50, -3, 50, 50, 5],
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity'],
            'src_feature_list': ['x', 'y', 'z', 'intensity']},
        'DATA_PROCESSOR': [],
    })
    ds = Argo2Dataset(dataset_cfg=cfg, class_names=['REGULAR_VEHICLE'],
                      training=False, root_path=tmp_path / 'train')
    dd = ds[0]
    assert dd['points'].shape[1] == 4 and len(dd['points']) == 200
