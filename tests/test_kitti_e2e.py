"""End-to-end KITTI pipeline on a synthetic mini dataset:

fabricated velodyne/label/calib files -> create_kitti_infos (+ GT database)
-> KittiDataset with full augmentation (GT sampling, flip/rot/scale)
-> padded collate -> one jitted train step -> eval loop -> KITTI AP.

This is the integration test the reference never had (SURVEY.md §4).
"""
import pickle
import struct

import numpy as np
import pytest

from pdm_ssd_tpu.utils.config import CfgNode, cfg_from_yaml_file


P2 = np.array([[700., 0., 600., 0.],
               [0., 700., 180., 0.],
               [0., 0., 1., 0.]], np.float32)
R0 = np.eye(3, dtype=np.float32)
V2C = np.array([[0., -1., 0., 0.],
                [0., 0., -1., 0.],
                [1., 0., 0., 0.]], np.float32)


def write_calib(path):
    lines = [
        'P0: ' + ' '.join(map(str, P2.reshape(-1))),
        'P1: ' + ' '.join(map(str, P2.reshape(-1))),
        'P2: ' + ' '.join(map(str, P2.reshape(-1))),
        'P3: ' + ' '.join(map(str, P2.reshape(-1))),
        'R0_rect: ' + ' '.join(map(str, R0.reshape(-1))),
        'Tr_velo_to_cam: ' + ' '.join(map(str, V2C.reshape(-1))),
        'Tr_imu_to_velo: ' + ' '.join(map(str, V2C.reshape(-1))),
    ]
    path.write_text('\n'.join(lines) + '\n')


def write_png_header(path, w=1242, h=375):
    sig = b'\x89PNG\r\n\x1a\n'
    ihdr_data = struct.pack('>IIBBBBB', w, h, 8, 2, 0, 0, 0)
    ihdr = struct.pack('>I', 13) + b'IHDR' + ihdr_data + b'\x00' * 4
    path.write_bytes(sig + ihdr)


def lidar_box_to_label(box, cls='Car'):
    """lidar (x,y,z_center,dx,dy,dz,heading) -> KITTI label line."""
    from pdm_ssd_tpu.datasets.kitti.calibration import Calibration
    from pdm_ssd_tpu.datasets.kitti import kitti_utils
    calib = Calibration({'P2': P2, 'P3': P2, 'R0': R0, 'Tr_velo2cam': V2C})
    cam = kitti_utils.boxes3d_lidar_to_kitti_camera(box[None, :7], calib)[0]
    bbox = kitti_utils.boxes3d_kitti_camera_to_imageboxes(
        cam[None], calib, image_shape=(375, 1242))[0]
    x, y, z, l, h, w, ry = cam
    alpha = -np.arctan2(-box[1], box[0]) + ry
    return (f'{cls} 0.00 0 {alpha:.2f} {bbox[0]:.2f} {bbox[1]:.2f} '
            f'{bbox[2]:.2f} {bbox[3]:.2f} {h:.2f} {w:.2f} {l:.2f} '
            f'{x:.2f} {y:.2f} {z:.2f} {ry:.2f}')


def make_mini_kitti(root, n_frames=3, seed=0):
    rng = np.random.RandomState(seed)
    (root / 'ImageSets').mkdir(parents=True)
    for sub in ['velodyne', 'label_2', 'calib', 'image_2']:
        (root / 'training' / sub).mkdir(parents=True)
    ids = [f'{i:06d}' for i in range(n_frames)]
    (root / 'ImageSets/train.txt').write_text('\n'.join(ids) + '\n')
    (root / 'ImageSets/val.txt').write_text('\n'.join(ids) + '\n')

    for fid in ids:
        boxes = []
        for _ in range(3):
            x = rng.uniform(8, 40)
            y = np.clip(rng.uniform(-0.5, 0.5) * x * 0.5, -15, 15)
            boxes.append([x, y, -0.8, 3.9, 1.6, 1.56, rng.uniform(-1.5, 1.5)])
        boxes = np.array(boxes, np.float32)
        # background points in FOV + points inside each box
        n_bg = 2000
        bg_x = rng.uniform(3, 60, n_bg)
        bg = np.stack([bg_x, bg_x * rng.uniform(-0.4, 0.4, n_bg),
                       rng.uniform(-1.6, 0.5, n_bg), rng.rand(n_bg)], 1)
        obj_pts = []
        for b in boxes:
            local = rng.uniform(-0.5, 0.5, (200, 3)) * b[3:6] * 0.9
            c, s = np.cos(b[6]), np.sin(b[6])
            gx = local[:, 0] * c - local[:, 1] * s + b[0]
            gy = local[:, 0] * s + local[:, 1] * c + b[1]
            gz = local[:, 2] + b[2]
            obj_pts.append(np.stack([gx, gy, gz, rng.rand(200)], 1))
        pts = np.concatenate([bg] + obj_pts).astype(np.float32)
        pts.tofile(str(root / 'training/velodyne' / f'{fid}.bin'))
        labels = [lidar_box_to_label(b) for b in boxes]
        (root / 'training/label_2' / f'{fid}.txt').write_text('\n'.join(labels) + '\n')
        write_calib(root / 'training/calib' / f'{fid}.txt')
        write_png_header(root / 'training/image_2' / f'{fid}.png')


@pytest.fixture(scope='module')
def mini_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp('kitti')
    make_mini_kitti(root)
    return root


def dataset_cfg(root):
    cfg = cfg_from_yaml_file('configs/dataset_configs/kitti_dataset.yaml', CfgNode())
    cfg.DATA_PATH = str(root)
    cfg.DATA_PROCESSOR[2]['NUM_POINTS'] = {'train': 2048, 'test': 2048}
    cfg.MAX_GT_BOXES = 32
    return cfg


def test_full_pipeline(mini_kitti):
    from pdm_ssd_tpu.datasets.kitti.kitti_dataset import KittiDataset, create_kitti_infos
    from pdm_ssd_tpu.datasets import build_dataloader
    from pdm_ssd_tpu.runtime import trainer, eval_utils
    from pdm_ssd_tpu.models import build_network
    from test_model_forward import tiny_model_cfg

    class_names = ['Car', 'Pedestrian', 'Cyclist']
    ds_cfg = dataset_cfg(mini_kitti)

    # 1. offline info generation + GT database (create_kitti_infos port)
    create_kitti_infos(ds_cfg, class_names, mini_kitti, mini_kitti, workers=1)
    assert (mini_kitti / 'kitti_infos_train.pkl').exists()
    assert (mini_kitti / 'kitti_dbinfos_train.pkl').exists()
    with open(mini_kitti / 'kitti_dbinfos_train.pkl', 'rb') as f:
        db = pickle.load(f)
    assert len(db['Car']) == 9  # 3 frames x 3 cars

    # 2. dataloader with full augmentation
    train_set, train_loader, _ = build_dataloader(
        dataset_cfg=ds_cfg, class_names=class_names, batch_size=2,
        root_path=mini_kitti, workers=0, training=True)
    batch = next(iter(train_loader))
    assert batch['points'].shape == (2, 2048, 4)
    assert batch['gt_boxes'].shape[0] == 2
    assert batch['gt_mask'].sum() > 0   # gt sampling may add more boxes

    # 3. one jitted train step on the tiny model
    model = build_network(tiny_model_cfg(), num_class=3,
                          dataset_cfg=CfgNode({'POINT_CLOUD_RANGE': [0, -40, -3, 70.4, 40, 1],
                                               'NUM_POINT_FEATURES': 4}))
    opt_cfg = CfgNode({'OPTIMIZER': 'adam_onecycle', 'LR': 0.003,
                       'WEIGHT_DECAY': 0.01, 'GRAD_NORM_CLIP': 10})
    state, tx, _ = trainer.create_train_state(
        model, trainer._filter_device_batch(batch), opt_cfg, 2, 1)
    step = trainer.make_train_step(model, tx)
    import jax
    state, metrics = step(state, trainer._filter_device_batch(batch))
    assert np.isfinite(float(jax.device_get(metrics['loss'])))

    # 4. eval loop end-to-end: predictions -> camera annos -> KITTI AP
    val_set, val_loader, _ = build_dataloader(
        dataset_cfg=ds_cfg, class_names=class_names, batch_size=1,
        root_path=mini_kitti, workers=0, training=False)
    ret = eval_utils.eval_one_epoch(
        model, state.params, state.batch_stats, val_loader, val_set,
        class_names, logger=None, result_dir=None)
    assert 'Car_3d/moderate_R40' in ret      # AP computed (untrained -> ~0)
    assert 'recall/rcnn_0.3' in ret


def test_voxel_pipeline_pointpillar(mini_kitti):
    """Voxel-path e2e: native C++ voxelizer -> padded voxel collate ->
    PillarVFE/scatter/anchor-head train step + predict."""
    from pdm_ssd_tpu.datasets import build_dataloader
    from pdm_ssd_tpu.runtime import trainer
    from pdm_ssd_tpu.models import build_network
    from test_detector3d_zoo import pointpillar_cfg
    import jax

    from pdm_ssd_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    class_names = ['Car', 'Pedestrian', 'Cyclist']
    ds_cfg = dataset_cfg(mini_kitti)
    if not (mini_kitti / 'kitti_infos_train.pkl').exists():
        create_kitti_infos(ds_cfg, class_names, mini_kitti, mini_kitti, workers=1)
    ds_cfg.POINT_CLOUD_RANGE = [0, -16, -3, 32, 16, 1]
    ds_cfg.DATA_PROCESSOR = [
        CfgNode({'NAME': 'mask_points_and_boxes_outside_range',
                 'REMOVE_OUTSIDE_BOXES': True}),
        CfgNode({'NAME': 'transform_points_to_voxels',
                 'VOXEL_SIZE': [1.0, 1.0, 4.0], 'MAX_POINTS_PER_VOXEL': 8,
                 'MAX_NUMBER_OF_VOXELS': {'train': 256, 'test': 256}}),
    ]
    train_set, train_loader, _ = build_dataloader(
        dataset_cfg=ds_cfg, class_names=class_names, batch_size=2,
        root_path=mini_kitti, workers=0, training=True)
    batch = next(iter(train_loader))
    assert batch['voxels'].shape[1] == 256          # static cap
    assert batch['voxel_mask'].any()

    model = build_network(pointpillar_cfg(), num_class=3,
                          dataset_cfg=ds_cfg, class_names=class_names)
    opt_cfg = CfgNode({'OPTIMIZER': 'adam_onecycle', 'LR': 0.003,
                       'WEIGHT_DECAY': 0.01, 'GRAD_NORM_CLIP': 10})
    state, tx, _ = trainer.create_train_state(
        model, trainer._filter_device_batch(batch), opt_cfg, 3, 1)
    step = trainer.make_train_step(model, tx)
    state, metrics = step(state, trainer._filter_device_batch(batch))
    import numpy as _np
    assert _np.isfinite(float(jax.device_get(metrics['loss'])))
    predict = trainer.make_predict_step(model)
    dets = jax.device_get(predict(state.params, state.batch_stats,
                                  trainer._filter_device_batch(batch)))
    assert dets['pred_boxes'].shape[0] == 2
