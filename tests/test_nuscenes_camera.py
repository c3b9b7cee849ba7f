"""nuScenes camera pipeline (VERDICT r4 item 3): camera-info creation +
consumption, image loading with train/eval resize-crop recorded in
`img_process_infos`, image_calibrate -> img_aug_matrix, host camera-depth
projection, the imgaug augmentor step, and BEVFusion forward+loss+predict
from real `build`-path dataset output (no hand-built camera tensors).
Reference: `pcdet/datasets/nuscenes/nuscenes_dataset.py:120-210`,
`datasets/processor/data_processor.py:233-281`,
`datasets/augmentor/data_augmentor.py:268-289`.
"""
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.datasets.nuscenes.nuscenes_dataset import NuScenesDataset
from pdm_ssd_tpu.datasets.nuscenes.nuscenes_info import create_nuscenes_infos

sys.path.insert(0, str(Path(__file__).parent))
from test_nuscenes_info import _write_tables, CAM_W, CAM_H, CAM_F


def _lidar_points(i):
    """(N, 5) cloud: background in the BEV range + a clump inside the gt
    box (which sits near lidar (15.2+i, -1.6, -1.3))."""
    rng = np.random.RandomState(100 + i)
    bg = np.stack([rng.uniform(1, 31, 300), rng.uniform(-15, 15, 300),
                   rng.uniform(-2.5, 0.5, 300), rng.rand(300),
                   np.zeros(300)], 1)
    obj = np.stack([rng.uniform(-2, 2, 120) + 15.2 + i,
                    rng.uniform(-0.9, 0.9, 120) - 1.6,
                    rng.uniform(-0.7, 0.7, 120) - 1.3, rng.rand(120),
                    np.zeros(120)], 1)
    return np.concatenate([bg, obj]).astype(np.float32)


@pytest.fixture(scope='module')
def nusc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('nusc_cam')
    _write_tables(root, with_cams=True, lidar_points=_lidar_points)
    create_nuscenes_infos(root, 'v1.0-mini', max_sweeps=1)
    return root


def _ds_cfg(root, imgaug=False, world_aug=False):
    aug_list = []
    if world_aug:
        aug_list += [
            {'NAME': 'random_world_flip', 'ALONG_AXIS_LIST': ['x']},
            {'NAME': 'random_world_rotation', 'WORLD_ROT_ANGLE': [-0.4, 0.4]},
            {'NAME': 'random_world_scaling', 'WORLD_SCALE_RANGE': [0.95, 1.05]},
        ]
    if imgaug:
        aug_list.append({'NAME': 'imgaug', 'ROT_LIM': [-5.4, 5.4],
                         'RAND_FLIP': True})
    return CfgNode({
        'DATA_PATH': str(root), 'VERSION': '',
        'INFO_PATH': {'train': ['nuscenes_infos_1sweeps_train.pkl'],
                      'test': ['nuscenes_infos_1sweeps_train.pkl']},
        'MAX_SWEEPS': 1, 'MAX_GT_BOXES': 8,
        'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
        'NUM_POINT_FEATURES': 5,
        'CAMERA_CONFIG': {
            'USE_CAMERA': True,
            'IMAGE': {'FINAL_DIM': [64, 96],
                      'RESIZE_LIM_TRAIN': [0.5, 0.5],
                      'RESIZE_LIM_TEST': [0.5, 0.5]}},
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
            'src_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp']},
        'DATA_AUGMENTOR': {'DISABLE_AUG_LIST': ['placeholder'],
                           'AUG_CONFIG_LIST': aug_list},
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'shuffle_points',
             'SHUFFLE_ENABLED': {'train': True, 'test': False}},
            {'NAME': 'sample_points',
             'NUM_POINTS': {'train': 1024, 'test': 1024}},
            {'NAME': 'image_normalize',
             'mean': [0.0, 0.0, 0.0], 'std': [1.0, 1.0, 1.0]},
            {'NAME': 'image_calibrate'},
            {'NAME': 'generate_camera_depth', 'IMAGE_DIM': [64, 96]},
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [1.0, 1.0, 4.0], 'MAX_POINTS_PER_VOXEL': 8,
             'MAX_NUMBER_OF_VOXELS': {'train': 256, 'test': 256}},
        ],
    })


def _dataset(root, training=False, **kw):
    return NuScenesDataset(_ds_cfg(root, **kw), class_names=['car'],
                           training=training, root_path=Path(root))


def test_info_cams_block(nusc_root):
    import pickle
    infos = pickle.loads(
        (nusc_root / 'nuscenes_infos_1sweeps_train.pkl').read_bytes())
    cams = infos[0]['cams']
    assert 'CAM_FRONT' in cams
    cam = cams['CAM_FRONT']
    np.testing.assert_allclose(cam['sensor2lidar_translation'],
                               [0.5, 0.0, -0.2], atol=1e-6)
    assert cam['camera_intrinsics'].shape == (3, 3)
    # rotation is orthonormal with det +1
    R = cam['sensor2lidar_rotation']
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) > 0.99


def _project(item, p_lidar):
    """lidar point -> final image pixel via the recorded chain (inverse
    lidar aug -> lidar2image -> img_aug_matrix), camera 0."""
    la = item.get('lidar_aug_matrix', np.eye(4))
    p = np.linalg.inv(la[:3, :3]) @ (np.asarray(p_lidar) - la[:3, 3])
    l2i = item['lidar2image'][0]
    uvw = l2i @ np.array([*p, 1.0])
    uv1 = np.array([uvw[0] / uvw[2], uvw[1] / uvw[2], 1.0])
    aug = item['img_aug_matrix'][0]
    q = aug[:3, :3] @ uv1 + aug[:3, 3]
    return q[0], q[1]


def test_eval_camera_loading_and_projection(nusc_root):
    ds = _dataset(nusc_root, training=False)
    item = ds[0]
    assert item['camera_imgs'].shape == (1, 64, 96, 3)
    assert item['camera_imgs'].dtype == np.float32
    assert item['img_aug_matrix'].shape == (1, 4, 4)
    np.testing.assert_allclose(item['img_aug_matrix'][0][:2, :2],
                               0.5 * np.eye(2), atol=1e-6)
    assert item['camera_depth'].shape == (1, 64, 96, 1)
    assert (item['camera_depth'] > 0).sum() > 50
    # the landmark dot at the gt center projects to a bright pixel
    gt = item['gt_boxes'][0]
    u, v = _project(item, gt[:3])
    ui, vi = int(round(u)), int(round(v))
    win = item['camera_imgs'][0, max(vi - 2, 0):vi + 3,
                              max(ui - 2, 0):ui + 3]
    assert win.max() > 0.9, (u, v)
    # depth at the landmark matches the camera-frame distance
    dwin = item['camera_depth'][0, max(vi - 3, 0):vi + 4,
                                max(ui - 3, 0):ui + 4, 0]
    pos = dwin[dwin > 0]
    assert len(pos) and abs(np.median(pos) - 14.7) < 2.5


def test_train_imgaug_and_world_aug_consistency(nusc_root):
    """The full consistency chain under randomized train-time augs: the
    (augmented) gt center, run through inverse lidar aug -> lidar2image ->
    img_aug_matrix, must land on the landmark dot in the (flipped/rotated)
    image."""
    np.random.seed(11)
    ds = _dataset(nusc_root, training=True, imgaug=True, world_aug=True)
    hits = 0
    for trial in range(6):
        item = ds[np.random.randint(3)]
        if len(item['gt_boxes']) == 0:
            continue
        u, v = _project(item, item['gt_boxes'][0][:3])
        ui, vi = int(round(u)), int(round(v))
        if not (3 <= ui < 93 and 3 <= vi < 61):
            continue
        win = item['camera_imgs'][0, vi - 3:vi + 4, ui - 3:ui + 4]
        assert win.max() > 0.75, (trial, u, v, float(win.max()))
        hits += 1
    assert hits >= 3, f'only {hits} projections landed in-image'


def test_bevfusion_from_dataset(nusc_root):
    """dataset -> collate -> BEVFusion train loss + jitted predict, with
    every camera tensor produced by the pipeline (closes the 'BEVFusion
    cannot be fed from its dataset' gap)."""
    from test_detector3d_zoo import centerpoint_cfg
    from pdm_ssd_tpu.models import build_network

    ds = _dataset(nusc_root, training=True)
    batch = ds.collate_batch([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)
             and (np.issubdtype(v.dtype, np.number) or v.dtype == bool)}

    head = centerpoint_cfg().DENSE_HEAD
    head.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE = 1
    head.CLASS_NAMES_EACH_HEAD = [['car']]
    cfg = CfgNode({
        'NAME': 'BevFusion',
        'IMAGE_BACKBONE': {'NUM_FILTERS': [8, 16, 32], 'OUT_CHANNEL': 16},
        'VTRANSFORM': {
            'IN_CHANNEL': 16, 'OUT_CHANNEL': 8,
            'IMAGE_SIZE': [64, 96], 'FEATURE_SIZE': [8, 12],
            'XBOUND': [0.0, 32.0, 1.0], 'YBOUND': [-16.0, 16.0, 1.0],
            'ZBOUND': [-4.0, 4.0, 8.0], 'DBOUND': [1.0, 17.0, 2.0],
            'DOWNSAMPLE': 1},
        'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False,
                'USE_ABSLOTE_XYZ': True, 'USE_NORM': True,
                'NUM_FILTERS': [16]},
        'MAP_TO_BEV': {'NAME': 'PointPillarScatter', 'NUM_BEV_FEATURES': 16},
        'FUSER': {'OUT_CHANNEL': 24},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1],
                        'LAYER_STRIDES': [1], 'NUM_FILTERS': [16],
                        'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [16]},
        'DENSE_HEAD': head,
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.05,
            'NMS_CONFIG': {'NMS_TYPE': 'circle_nms', 'NMS_RADIUS': 0.8,
                           'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16}},
    })
    model = build_network(cfg, num_class=1, dataset_cfg=ds.dataset_cfg,
                          class_names=['car'])
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, _), _ = model.apply(variables, batch, training=True,
                               mutable=['batch_stats'],
                               method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = jax.jit(lambda b: model.apply(variables, b,
                                         method=model.predict))(batch)
    assert np.isfinite(np.asarray(dets['pred_boxes'])).all()
