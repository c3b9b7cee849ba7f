"""Waymo multi-frame sequence data path (VERDICT r4 item 2): pose-composed
frame accumulation, timestamp channel, offline stage-1 proposal loading, and
the fixed-shape frame split feeding MPPNet — driven from the real
`WaymoDataset.__getitem__ -> collate` pipeline on a synthetic moving-ego
sequence set, not hand-built batches. Reference semantics:
`pcdet/datasets/waymo/waymo_dataset.py:94-112,211-239,250-337`.
"""
import pickle
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.datasets.waymo.synthetic import make_mini_waymo
from pdm_ssd_tpu.datasets.waymo.waymo_dataset import WaymoDataset

T_FRAMES = 4  # SAMPLE_OFFSET [-3, 0] -> 3 previous + current


def seq_ds_cfg(root, use_predbox=True, training_aug=False):
    cfg = CfgNode({
        'DATASET': 'WaymoDataset',
        'DATA_PATH': str(root),
        'PROCESSED_DATA_TAG': 'waymo_processed_data_v0_5_0',
        'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
        'NUM_POINT_FEATURES': 5,
        'MAX_GT_BOXES': 16,
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'SAMPLED_INTERVAL': {'train': 1, 'test': 1},
        'SEQUENCE_CONFIG': {
            'ENABLED': True, 'SAMPLE_OFFSET': [-(T_FRAMES - 1), 0],
            'NUM_POINTS_PER_FRAME': 512, 'MAX_PRED_BOXES': 8},
        'USE_PREDBOX': use_predbox,
        'ROI_BOXES_PATH': {'train': str(Path(root) / 'pred_boxes.pkl'),
                           'test': str(Path(root) / 'pred_boxes.pkl')},
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
            'src_feature_list': ['x', 'y', 'z', 'intensity', 'elongation',
                                 'timestamp']},
        'DATA_AUGMENTOR': {
            'DISABLE_AUG_LIST': ['placeholder'],
            'AUG_CONFIG_LIST': ([
                {'NAME': 'random_world_flip', 'ALONG_AXIS_LIST': ['x']},
                {'NAME': 'random_world_rotation',
                 'WORLD_ROT_ANGLE': [-0.5, 0.5]},
                {'NAME': 'random_world_scaling',
                 'WORLD_SCALE_RANGE': [0.9, 1.1]},
            ] if training_aug else [])},
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'shuffle_points',
             'SHUFFLE_ENABLED': {'train': True, 'test': False}},
            {'NAME': 'sample_points',
             'NUM_POINTS': {'train': 2048, 'test': 2048}},
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [1.0, 1.0, 4.0], 'MAX_POINTS_PER_VOXEL': 8,
             'MAX_NUMBER_OF_VOXELS': {'train': 256, 'test': 256}},
        ],
    })
    return cfg


@pytest.fixture(scope='module')
def mini_waymo(tmp_path_factory):
    root = tmp_path_factory.mktemp('mini_waymo')
    make_mini_waymo(root, n_seq=1, n_frames=6, n_bg=1200, seed=0,
                    class_name='Car')
    return root


def _dataset(root, training=False, **kw):
    return WaymoDataset(dataset_cfg=seq_ds_cfg(root, **kw),
                        class_names=['Car', 'Pedestrian', 'Cyclist'],
                        training=training, root_path=Path(root))


def test_transform_prebox_parity_vs_reference(mini_waymo):
    """Our pose transform vs the reference's own
    `transform_prebox_to_current` (`waymo_dataset.py:211-239`) on random
    boxes/poses, 9- and 11-wide."""
    torch = pytest.importorskip('torch')
    sys.path.insert(0, str(Path(__file__).parent))
    import ref_oracle
    mod = ref_oracle.load('pcdet.datasets.waymo.waymo_dataset')
    rng = np.random.RandomState(0)

    def rand_pose(t):
        yaw = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        p = np.eye(4)
        p[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        p[:3, 3] = rng.uniform(-20, 20, 3)
        return p

    for width in (9, 11):
        boxes = rng.uniform(-10, 10, (7, width))
        boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 1
        p_pre, p_cur = rand_pose(0), rand_pose(1)
        ours = WaymoDataset.transform_prebox_to_current(
            boxes.copy(), p_pre, p_cur)
        ref = mod.WaymoDataset.transform_prebox_to_current(
            boxes.copy(), p_pre, p_cur)
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_sequence_points_align_static_objects(mini_waymo):
    """Pose-composing previous frames must land a STATIC global object's
    points on the current frame's gt box, at every timestamp bucket."""
    ds = _dataset(mini_waymo, training=False, use_predbox=False)
    index = 4                                    # room for 3 previous frames
    info = ds.infos[index]
    seq = info['point_cloud']['lidar_sequence']
    idx = info['point_cloud']['sample_idx']
    pts = ds.get_lidar(seq, idx)
    points, num_all, pre_list, poses, _, _, _ = ds.get_sequence_data(
        info, pts, seq, idx, ds.dataset_cfg.SEQUENCE_CONFIG)
    assert poses.shape == (T_FRAMES, 4, 4)
    assert len(num_all) == T_FRAMES and num_all.sum() == len(points)
    # static gt boxes (vx == vy == 0) in the current frame
    gt = info['annos']['gt_boxes_lidar']
    static = gt[(np.abs(gt[:, 7:9]) < 1e-6).all(-1)]
    assert len(static) >= 2
    ts_col = points[:, -1]
    for k, pre in enumerate([idx] + list(pre_list)):
        ts = 0.1 * (idx - int(pre))
        frame_pts = points[np.abs(ts_col - ts) < 0.05]
        for box in static:
            d = np.linalg.norm(frame_pts[:, :2] - box[None, :2], axis=-1)
            # the object's surface points (|half-diag| ~2.5 m) are present
            assert (d < 2.6).sum() > 30, (k, ts)


def test_getitem_collate_fixed_shapes(mini_waymo):
    ds = _dataset(mini_waymo, training=False)
    item = ds[4]
    C = 5                      # x, y, z, intensity, timestamp
    assert item['points_multi_frame'].shape == (T_FRAMES, 512, C)
    assert item['poses'].shape == (T_FRAMES, 4, 4)
    assert item['roi_boxes'].shape == (T_FRAMES, 8, 9)
    assert item['roi_scores'].shape == (T_FRAMES, 8)
    assert item['roi_labels'].shape == (T_FRAMES, 8)
    # frame 0 of the stack is the current frame: timestamps all ~0
    assert np.abs(item['points_multi_frame'][0, :, -1]).max() < 1e-6
    # older frames carry their 0.1 s-step timestamps
    assert np.allclose(item['points_multi_frame'][2, :, -1], 0.2, atol=1e-4)
    batch = ds.collate_batch([ds[4], ds[5]])
    assert batch['points_multi_frame'].shape == (2, T_FRAMES, 512, C)
    assert batch['poses'].shape == (2, T_FRAMES, 4, 4)
    assert batch['roi_boxes'].shape == (2, T_FRAMES, 8, 9)
    # offline proposals track the gt they were fabricated from (<=5 cm noise)
    rb = np.asarray(item['roi_boxes'][0])
    valid = (rb[:, 3:6] > 0).all(-1)
    gt = np.asarray(item['gt_boxes'])[:, :7]
    for b in rb[valid]:
        assert np.linalg.norm(gt[:, :3] - b[None, :3], axis=-1).min() < 0.1


def test_roi_boxes_follow_world_augmentation(mini_waymo):
    """Train-time world flip/rot/scale must transform the offline proposals
    with the same noise as the gt boxes: fabricated proposals stay within
    their noise bound of SOME gt box after augmentation."""
    np.random.seed(7)
    ds = _dataset(mini_waymo, training=True, training_aug=True)
    for trial in range(4):
        item = ds[4]
        rb = np.asarray(item['roi_boxes'][0])
        valid = (rb[:, 3:6] > 0).all(-1)
        gt = np.asarray(item['gt_boxes'])[:, :7]
        if len(gt) == 0 or not valid.any():
            continue
        for b in rb[valid]:
            d = np.linalg.norm(gt[:, :3] - b[None, :3], axis=-1).min()
            assert d < 0.15, (trial, d)


def test_mppnet_trains_and_predicts_from_dataset(mini_waymo):
    """dataset -> collate -> MPPNet: training forward with finite loss +
    grads through the offline-proposal (USE_PREDBOX) path, and jitted
    predict. Closes the 'MPPNet cannot be fed from its dataset' gap."""
    sys.path.insert(0, str(Path(__file__).parent))
    from test_detector3d_zoo import pvrcnn_cfg
    from test_mppnet_depth import _head_cfg
    from pdm_ssd_tpu.models import build_network

    ds = _dataset(mini_waymo, training=True)
    batch = ds.collate_batch([ds[3], ds[4]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)
             and (np.issubdtype(v.dtype, np.number) or v.dtype == bool)}

    cfg = pvrcnn_cfg()
    cfg.NAME = 'MPPNet'
    del cfg['PFE']
    del cfg['POINT_HEAD']
    cfg.ROI_HEAD = _head_cfg(T=T_FRAMES)
    model = build_network(cfg, num_class=3, dataset_cfg=ds.dataset_cfg,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)

    def loss_fn(params):
        (loss, _), _ = model.apply(
            {**variables, 'params': params}, batch,
            mutable=['batch_stats'],
            rngs={'targets': jax.random.PRNGKey(1)},
            method=model.forward_with_loss)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)

    @jax.jit
    def predict(b):
        return model.apply(variables, b, method=model.predict)

    det = predict(batch)
    det = det[0] if isinstance(det, tuple) else det
    assert np.isfinite(np.asarray(det['pred_boxes'])).all()
