"""End-to-end KITTI pipeline on a synthetic mini dataset:

fabricated velodyne/label/calib files -> create_kitti_infos (+ GT database)
-> KittiDataset with full augmentation (GT sampling, flip/rot/scale)
-> padded collate -> one jitted train step -> eval loop -> KITTI AP.

This is the integration test the reference never had (SURVEY.md §4).
"""
import pickle

import numpy as np
import pytest

from pdm_ssd_tpu.utils.config import CfgNode, cfg_from_yaml_file


from pdm_ssd_tpu.datasets.kitti.synthetic import (  # noqa: F401
    P2, R0, V2C, write_calib, write_png_header, lidar_box_to_label,
    make_mini_kitti)


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
