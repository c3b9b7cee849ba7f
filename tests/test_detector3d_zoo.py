"""Config-assembled detector zoo: PointPillar (anchor head) and CenterPoint
(heatmap head) tiny-shape forward + loss + predict on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.models import build_network


def ds_cfg_voxel():
    return CfgNode({
        'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
        'NUM_POINT_FEATURES': 4,
        'DATA_PROCESSOR': [
            {'NAME': 'transform_points_to_voxels', 'VOXEL_SIZE': [1.0, 1.0, 4.0],
             'MAX_POINTS_PER_VOXEL': 8,
             'MAX_NUMBER_OF_VOXELS': {'train': 128, 'test': 128}},
        ],
    })


def pointpillar_cfg():
    return CfgNode({
        'NAME': 'PointPillar',
        'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False,
                'USE_ABSLOTE_XYZ': True, 'USE_NORM': True, 'NUM_FILTERS': [16]},
        'MAP_TO_BEV': {'NAME': 'PointPillarScatter', 'NUM_BEV_FEATURES': 16},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1, 1],
                        'LAYER_STRIDES': [2, 2], 'NUM_FILTERS': [16, 32],
                        'UPSAMPLE_STRIDES': [1, 2],
                        'NUM_UPSAMPLE_FILTERS': [16, 16]},
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
            'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
            'TARGET_ASSIGNER_CONFIG': {'NAME': 'AxisAlignedTargetAssigner',
                                       'FEATURE_MAP_STRIDE': 2,
                                       'MATCH_HEIGHT': False,
                                       'BOX_CODER': 'ResidualCoder'},
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                 'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
                 'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
                {'class_name': 'Pedestrian', 'anchor_sizes': [[0.8, 0.6, 1.73]],
                 'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
                 'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
                {'class_name': 'Cyclist', 'anchor_sizes': [[1.76, 0.6, 1.73]],
                 'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
                 'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
            ],
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.05,
            'NMS_CONFIG': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.1,
                           'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16}},
    })


def centerpoint_cfg():
    return CfgNode({
        'NAME': 'CenterPoint',
        'VFE': {'NAME': 'DynamicPillarVFE'},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1],
                        'LAYER_STRIDES': [2], 'NUM_FILTERS': [16],
                        'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [16]},
        'DENSE_HEAD': {
            'NAME': 'CenterHead', 'CLASS_AGNOSTIC': False,
            'CLASS_NAMES_EACH_HEAD': [['Car', 'Pedestrian', 'Cyclist']],
            'SHARED_CONV_CHANNEL': 16, 'NUM_HM_CONV': 2,
            'SEPARATE_HEAD_CFG': {
                'HEAD_ORDER': ['center', 'center_z', 'dim', 'rot'],
                'HEAD_DICT': {
                    'center': {'out_channels': 2, 'num_conv': 2},
                    'center_z': {'out_channels': 1, 'num_conv': 2},
                    'dim': {'out_channels': 3, 'num_conv': 2},
                    'rot': {'out_channels': 2, 'num_conv': 2}}},
            'TARGET_ASSIGNER_CONFIG': {'FEATURE_MAP_STRIDE': 2,
                                       'NUM_MAX_OBJS': 8,
                                       'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'code_weights': [1.0] * 8}},
            'POST_PROCESSING': {'SCORE_THRESH': 0.05,
                                'POST_CENTER_LIMIT_RANGE': [0, -16, -3, 32, 16, 1],
                                'MAX_OBJ_PER_SAMPLE': 16}},
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.05,
            'NMS_CONFIG': {'NMS_TYPE': 'circle_nms', 'NMS_RADIUS': 0.8,
                           'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16}},
    })


def make_batch(rng, B=2, N=128):
    pts = np.stack([rng.uniform(0, 32, (B, N)), rng.uniform(-16, 16, (B, N)),
                    rng.uniform(-3, 1, (B, N)), rng.rand(B, N)], -1).astype(np.float32)
    gt = np.zeros((B, 4, 8), np.float32)
    gt[:, :, 0] = rng.uniform(4, 28, (B, 4))
    gt[:, :, 1] = rng.uniform(-12, 12, (B, 4))
    gt[:, :, 2] = -1.0
    gt[:, :, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :, 6] = rng.uniform(-np.pi, np.pi, (B, 4))
    gt[:, :, 7] = rng.randint(1, 4, (B, 4))
    # voxel tensors for the PillarVFE path
    V, P = 128, 8
    vox = np.zeros((B, V, P, 4), np.float32)
    coords = np.zeros((B, V, 3), np.int32)
    nump = np.zeros((B, V), np.int32)
    for b in range(B):
        for v in range(64):
            k = rng.randint(1, P)
            vox[b, v, :k] = pts[b, rng.randint(0, N, k)]
            coords[b, v] = [0, rng.randint(0, 32), rng.randint(0, 32)]
            nump[b, v] = k
    return {
        'points': jnp.asarray(pts), 'gt_boxes': jnp.asarray(gt),
        'gt_mask': jnp.ones((B, 4), bool), 'voxels': jnp.asarray(vox),
        'voxel_coords': jnp.asarray(coords), 'voxel_num_points': jnp.asarray(nump),
        'voxel_mask': jnp.asarray(nump > 0),
    }


@pytest.mark.parametrize('cfg_fn', [pointpillar_cfg, centerpoint_cfg])
def test_zoo_forward_loss_predict(cfg_fn, rng):
    model = build_network(cfg_fn(), num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch, training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    B = batch['points'].shape[0]
    assert dets['pred_boxes'].shape[0] == B
    assert dets['pred_boxes'].shape[2] == 7
    assert dets['pred_mask'].dtype == bool


def test_anchor_assignment_positive_hit(rng):
    """A gt box exactly on an anchor must produce a positive anchor."""
    from pdm_ssd_tpu.models.dense_heads.anchor_head import AnchorHeadSingle
    cfg = pointpillar_cfg()['DENSE_HEAD']
    head = AnchorHeadSingle(model_cfg=cfg, input_channels=16, num_class=3,
                            class_names=['Car', 'Pedestrian', 'Cyclist'],
                            grid_size=(16, 16), point_cloud_range=(0, -16, -3, 32, 16, 1))
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [16.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0, 1]   # Car on-grid
    # anchor centers on this 2 m test grid sit at odd coordinates
    gt[0, 1] = [7.0, 3.0, -0.6 + 1.73 / 2, 0.8, 0.6, 1.73, 0.0, 2]
    batch = {'gt_boxes': jnp.asarray(gt), 'gt_mask': jnp.ones((1, 2), bool)}
    t = head.assign_targets(batch)
    labels = np.asarray(t['anchor_cls_labels'])[0]
    assert (labels == 1).sum() >= 1, 'car anchor matched'
    assert (labels == 2).sum() >= 1, 'pedestrian anchor matched'
    assert (labels == 0).sum() > 0.8 * labels.size


def second_cfg():
    cfg = pointpillar_cfg()
    cfg['NAME'] = 'SECONDNet'
    del cfg['MAP_TO_BEV']
    cfg['VFE'] = {'NAME': 'MeanVFE'}
    cfg['BACKBONE_3D'] = {'NAME': 'DenseVoxelBackBone8x',
                          'NUM_FILTERS': [8, 8, 16, 16]}
    cfg['BACKBONE_2D'] = {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1],
                          'LAYER_STRIDES': [1], 'NUM_FILTERS': [32],
                          'UPSAMPLE_STRIDES': [2], 'NUM_UPSAMPLE_FILTERS': [32]}
    cfg['DENSE_HEAD']['TARGET_ASSIGNER_CONFIG']['FEATURE_MAP_STRIDE'] = 4
    return cfg


def ds_cfg_voxel3d():
    return CfgNode({
        'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
        'NUM_POINT_FEATURES': 4,
        'DATA_PROCESSOR': [
            {'NAME': 'transform_points_to_voxels', 'VOXEL_SIZE': [1.0, 1.0, 0.5],
             'MAX_POINTS_PER_VOXEL': 8,
             'MAX_NUMBER_OF_VOXELS': {'train': 128, 'test': 128}},
        ],
    })


def test_second_voxel_backbone(rng):
    model = build_network(second_cfg(), num_class=3, dataset_cfg=ds_cfg_voxel3d(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    # voxel coords need valid z bins for the 3D grid (D=8)
    B, V, _ = batch['voxel_coords'].shape
    coords = np.array(batch['voxel_coords'])
    coords[..., 0] = np.random.RandomState(0).randint(0, 8, (B, V))
    batch['voxel_coords'] = jnp.asarray(coords)
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch, training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[2] == 7


def pointrcnn_cfg():
    return CfgNode({
        'NAME': 'PointRCNN',
        'BACKBONE_3D': {
            'NAME': 'PointNet2MSG',
            'SA_CONFIG': {
                'NPOINTS': [64, 32],
                'RADIUS': [[0.5, 1.0], [1.0, 2.0]],
                'NSAMPLE': [[8, 8], [8, 8]],
                'MLPS': [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
            },
            'FP_MLPS': [],
        },
        'POINT_HEAD': {
            'NAME': 'PointHeadBox', 'CLS_FC': [16], 'REG_FC': [16],
            'TARGET_CONFIG': {
                'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
                'BOX_CODER': 'PointResidualCoder',
                'BOX_CODER_CONFIG': {
                    'use_mean_size': True,
                    'mean_size': [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73],
                                  [1.76, 0.6, 1.73]]}},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'point_cls_weight': 1.0, 'point_box_weight': 1.0,
                'code_weights': [1.0] * 8}},
        },
        'ROI_HEAD': {
            'NAME': 'PointRCNNHead',
            'NUM_SAMPLED_POINTS': 16, 'ROI_POINT_EXTRA': 0.6,
            'XYZ_UP_LAYER': [32, 32], 'SHARED_FC': [32], 'CLS_FC': [32],
            'REG_FC': [32],
            'NMS_CONFIG': {
                'TRAIN': {'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16,
                          'NMS_THRESH': 0.8},
                'TEST': {'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16,
                         'NMS_THRESH': 0.85}},
            'TARGET_CONFIG': {'CLS_FG_THRESH': 0.6, 'CLS_BG_THRESH': 0.45,
                              'REG_FG_THRESH': 0.55, 'CLS_BG_THRESH_LO': 0.1},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.05,
            'NMS_CONFIG': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.1,
                           'NMS_PRE_MAXSIZE': 16, 'NMS_POST_MAXSIZE': 8}},
    })


def test_pointrcnn_two_stage(rng):
    ds = CfgNode({'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
                  'NUM_POINT_FEATURES': 4})
    model = build_network(pointrcnn_cfg(), num_class=3, dataset_cfg=ds)
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch, training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert 'rcnn_cls_loss' in tb and 'point_loss_cls' in tb
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[2] == 7
    assert dets['pred_mask'].dtype == bool


def pvrcnn_cfg():
    return CfgNode({
        'NAME': 'PVRCNN',
        'VFE': {'NAME': 'MeanVFE'},
        'BACKBONE_3D': {'NAME': 'DenseVoxelBackBone8x',
                        'NUM_FILTERS': [8, 8, 16, 16]},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1],
                        'LAYER_STRIDES': [1], 'NUM_FILTERS': [16],
                        'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [16]},
        'DENSE_HEAD': (lambda d: (d.TARGET_ASSIGNER_CONFIG.update(
            {'FEATURE_MAP_STRIDE': 8}), d)[1])(pointpillar_cfg().DENSE_HEAD),
        'PFE': {
            'NAME': 'VoxelSetAbstraction', 'POINT_SOURCE': 'raw_points',
            'NUM_KEYPOINTS': 64, 'NUM_OUTPUT_FEATURES': 32,
            'SAMPLE_METHOD': 'FPS',
            'FEATURES_SOURCE': ['bev', 'x_conv3', 'x_conv4', 'raw_points'],
            'SA_LAYER': {
                'raw_points': {'MLPS': [[8, 8], [8, 8]],
                               'POOL_RADIUS': [0.8, 1.6], 'NSAMPLE': [8, 8]},
                'x_conv3': {'DOWNSAMPLE_FACTOR': 4, 'MLPS': [[16, 16]],
                            'POOL_RADIUS': [2.4], 'NSAMPLE': [8]},
                'x_conv4': {'DOWNSAMPLE_FACTOR': 8, 'MLPS': [[16, 16]],
                            'POOL_RADIUS': [4.8], 'NSAMPLE': [8]},
            }},
        'POINT_HEAD': {
            'NAME': 'PointHeadSimple', 'CLS_FC': [16], 'CLASS_AGNOSTIC': True,
            'USE_POINT_FEATURES_BEFORE_FUSION': False,
            'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {'point_cls_weight': 1.0}}},
        'ROI_HEAD': {
            'NAME': 'PVRCNNHead', 'CLASS_AGNOSTIC': True, 'GRID_SIZE': 3,
            'POOL_MAX_KEYPOINTS': 32,
            'SHARED_FC': [32], 'CLS_FC': [16], 'REG_FC': [16],
            'NMS_CONFIG': {
                'TRAIN': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.8,
                          'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16},
                'TEST': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.7,
                         'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16}},
            'ROI_GRID_POOL': {'POOL_RADIUS': [0.8, 1.6], 'NSAMPLE': [8, 8],
                              'MLPS': [[16, 16], [16, 16]]},
            'TARGET_CONFIG': {
                'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
                'SAMPLE_ROI_BY_EACH_CLASS': True, 'CLS_SCORE_TYPE': 'roi_iou',
                'CLS_FG_THRESH': 0.75, 'CLS_BG_THRESH': 0.25,
                'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
                'REG_FG_THRESH': 0.55},
            'LOSS_CONFIG': {
                'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
                'CORNER_LOSS_REGULARIZATION': True,
                'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                                 'rcnn_corner_weight': 1.0,
                                 'code_weights': [1.0] * 7}}},
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.05,
            'NMS_CONFIG': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.1,
                           'NMS_PRE_MAXSIZE': 16, 'NMS_POST_MAXSIZE': 8}},
    })


def test_pvrcnn_forward_loss_predict(rng):
    model = build_network(pvrcnn_cfg(), num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    # MeanVFE consumes 'voxels' + 'voxel_num_points'
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)},
                           batch, training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(2)},
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert 'rcnn_cls_loss' in tb or any('rcnn' in k for k in tb)
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[0] == batch['points'].shape[0]
    assert dets['pred_boxes'].shape[2] == 7

    # gradients flow end to end
    def loss_fn(p):
        (l, _), _ = model.apply({'params': p,
                                 'batch_stats': variables['batch_stats']},
                                batch, training=True, mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(3)},
                                method=model.forward_with_loss)
        return l
    g = jax.grad(loss_fn)(variables['params'])
    total = sum(np.abs(np.asarray(v)).sum() for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def voxelrcnn_cfg():
    cfg = pvrcnn_cfg()
    cfg.NAME = 'VoxelRCNN'
    del cfg['PFE']
    del cfg['POINT_HEAD']
    cfg.ROI_HEAD.NAME = 'VoxelRCNNHead'
    del cfg.ROI_HEAD['POOL_MAX_KEYPOINTS']
    cfg.ROI_HEAD.ROI_GRID_POOL = CfgNode({
        'FEATURES_SOURCE': ['x_conv3', 'x_conv4'],
        'x_conv3': {'MLPS': [16, 16]},
        'x_conv4': {'MLPS': [16, 16]},
    })
    return cfg


def test_voxelrcnn_forward_loss_predict(rng):
    model = build_network(voxelrcnn_cfg(), num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)},
                           batch, training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(2)},
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[0] == batch['points'].shape[0]
    assert dets['pred_boxes'].shape[2] == 7


def parta2_cfg():
    cfg = pvrcnn_cfg()
    cfg.NAME = 'PartA2Net'
    del cfg['PFE']
    cfg.BACKBONE_3D = CfgNode({'NAME': 'DenseUNetV2',
                               'NUM_FILTERS': [8, 8, 16, 16]})
    cfg.POINT_HEAD = CfgNode({
        'NAME': 'PointIntraPartOffsetHead', 'CLS_FC': [16], 'PART_FC': [16],
        'CLASS_AGNOSTIC': True,
        'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]}})
    cfg.ROI_HEAD.NAME = 'PartA2FCHead'
    del cfg.ROI_HEAD['POOL_MAX_KEYPOINTS']
    del cfg.ROI_HEAD['ROI_GRID_POOL']
    cfg.ROI_HEAD.ROI_AWARE_POOL = CfgNode({
        'POOL_SIZE': 6, 'NUM_FEATURES': 8, 'MAX_POINTS': 32})
    cfg.ROI_HEAD.SEG_MASK_SCORE_THRESH = 0.3
    return cfg


def test_parta2_forward_loss_predict(rng):
    model = build_network(parta2_cfg(), num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)},
                           batch, training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(2)},
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert 'part_seg_loss' in tb and 'part_reg_loss' in tb
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[0] == batch['points'].shape[0]
    assert dets['pred_boxes'].shape[2] == 7


def second_iou_cfg():
    cfg = pvrcnn_cfg()
    cfg.NAME = 'SECONDNetIoU'
    del cfg['PFE']
    del cfg['POINT_HEAD']
    cfg.ROI_HEAD.NAME = 'SECONDHead'
    del cfg.ROI_HEAD['POOL_MAX_KEYPOINTS']
    del cfg.ROI_HEAD['ROI_GRID_POOL']
    del cfg.ROI_HEAD['GRID_SIZE']
    cfg.ROI_HEAD.ROI_GRID_POOL = CfgNode({'GRID_SIZE': 7,
                                          'DOWNSAMPLE_RATIO': 8})
    cfg.ROI_HEAD.SHARED_FC = [32]
    cfg.ROI_HEAD.IOU_FC = [16]
    cfg.ROI_HEAD.LOSS_CONFIG = CfgNode({
        'IOU_LOSS': 'BinaryCrossEntropy',
        'LOSS_WEIGHTS': {'rcnn_iou_weight': 1.0}})
    cfg.POST_PROCESSING.IOU_RECTIFIER = 0.71
    return cfg


def test_second_iou_forward_loss_predict(rng):
    model = build_network(second_iou_cfg(), num_class=3,
                          dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)},
                           batch, training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(2)},
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert 'rcnn_loss_iou' in tb
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[0] == batch['points'].shape[0]


def test_anchor_head_multi(rng):
    cfg = pointpillar_cfg()
    cfg.DENSE_HEAD.NAME = 'AnchorHeadMulti'
    cfg.DENSE_HEAD.SHARED_CONV_NUM_FILTER = 16
    cfg.DENSE_HEAD.RPN_HEAD_CFGS = [
        {'HEAD_CLS_NAME': ['Car']},
        {'HEAD_CLS_NAME': ['Pedestrian', 'Cyclist']},
    ]
    model = build_network(cfg, num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[-1] == 7


def test_dsvt_backbone_centerpoint(rng):
    """DSVT-style dense window-attention backbone in the CenterPoint config."""
    cfg = centerpoint_cfg()
    cfg.NAME = 'DSVT'
    cfg.BACKBONE_2D = CfgNode({
        'NAME': 'DSVTBackbone', 'WINDOW_SHAPE': [8, 8],
        'D_MODEL': [16, 16], 'NHEAD': [2, 2], 'DIM_FEEDFORWARD': [32, 32],
        'BLOCKS_PER_STAGE': [2, 2], 'STAGE_STRIDES': [1, 2]})
    model = build_network(cfg, num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[-1] == 7


def test_voxelnext_config_assembly(rng):
    """VoxelNeXt as configuration: voxel ladder + CenterHead, no BEV
    backbone (the dense recast of the sparse-head design)."""
    cfg = centerpoint_cfg()
    cfg.NAME = 'VoxelNeXt'
    cfg.VFE = CfgNode({'NAME': 'MeanVFE'})
    cfg.BACKBONE_3D = CfgNode({'NAME': 'DenseVoxelBackBone8x',
                               'NUM_FILTERS': [8, 8, 16, 16]})
    del cfg['BACKBONE_2D']
    cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE = 8
    model = build_network(cfg, num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[-1] == 7


def test_pvrcnn_plusplus(rng):
    cfg = pvrcnn_cfg()
    cfg.NAME = 'PVRCNNPlusPlus'
    cfg.PFE.SAMPLE_METHOD = 'SPC'
    cfg.PFE.SPC_SAMPLING = CfgNode({'SAMPLE_RADIUS_WITH_ROI': 4.0})
    cfg.PFE.SA_LAYER.raw_points.AGGREGATION = 'VectorPoolAgg'
    cfg.PFE.SA_LAYER.raw_points.LOCAL_GRID = 2
    model = build_network(cfg, num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)},
                           batch, training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(2)},
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[-1] == 7


def test_transfusion_head(rng):
    cfg = centerpoint_cfg()
    cfg.NAME = 'TransFusion'
    cfg.DENSE_HEAD = CfgNode({
        'NAME': 'TransFusionHead', 'HIDDEN_CHANNEL': 16, 'NUM_PROPOSALS': 16,
        'NUM_HEADS': 2, 'FEATURE_MAP_STRIDE': 2,
        'TARGET_ASSIGNER_CONFIG': {'FEATURE_MAP_STRIDE': 2,
                                   'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2},
        'POST_PROCESSING': {'SCORE_THRESH': 0.0}})
    model = build_network(cfg, num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert 'tf_cls_loss' in tb and 'tf_reg_loss' in tb
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape == (2, 16, 7)

    def loss_fn(p):
        (l, _), _ = model.apply({'params': p,
                                 'batch_stats': variables['batch_stats']},
                                batch, training=True, mutable=['batch_stats'],
                                method=model.forward_with_loss)
        return l
    g = jax.grad(loss_fn)(variables['params'])
    total = sum(np.abs(np.asarray(v)).sum() for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_mppnet_multiframe(rng):
    cfg = pvrcnn_cfg()
    cfg.NAME = 'MPPNet'
    del cfg['PFE']
    del cfg['POINT_HEAD']
    cfg.ROI_HEAD = CfgNode({
        'NAME': 'MPPNetHead', 'CLASS_AGNOSTIC': True,
        'NUM_FRAMES': 4, 'NUM_GROUPS': 2, 'SAMPLE_POINTS_PER_FRAME': 8,
        'HIDDEN_CHANNEL': 16, 'NUM_HEADS': 2,
        'SHARED_FC': [32], 'CLS_FC': [16], 'REG_FC': [16],
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.8,
                      'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16},
            'TEST': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.7,
                     'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16}},
        'TARGET_CONFIG': {
            'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
            'SAMPLE_ROI_BY_EACH_CLASS': True, 'CLS_SCORE_TYPE': 'roi_iou',
            'CLS_FG_THRESH': 0.75, 'CLS_BG_THRESH': 0.25,
            'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
            'REG_FG_THRESH': 0.55},
        'LOSS_CONFIG': {
            'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
            'CORNER_LOSS_REGULARIZATION': True,
            'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                             'rcnn_corner_weight': 1.0,
                             'code_weights': [1.0] * 7}}})
    model = build_network(cfg, num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    # 4-frame ego-aligned stack with slight per-frame jitter
    pts = np.asarray(batch['points'])
    stack = np.stack([pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
                      for _ in range(4)], axis=1)
    batch['points_multi_frame'] = jnp.asarray(stack)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)},
                           batch, training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(2)},
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[-1] == 7

    def loss_fn(p):
        (l, _), _ = model.apply({'params': p,
                                 'batch_stats': variables['batch_stats']},
                                batch, training=True, mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(3)},
                                method=model.forward_with_loss)
        return l
    g = jax.grad(loss_fn)(variables['params'])
    total = sum(np.abs(np.asarray(v)).sum() for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_atss_assigner(rng):
    cfg = pointpillar_cfg()
    cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.NAME = 'ATSSTargetAssigner'
    cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.TOPK = 9
    model = build_network(cfg, num_class=3, dataset_cfg=ds_cfg_voxel(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert float(tb.get('anchor_loc_loss', 0.0)) > 0  # positives were matched


def test_pointrcnn_two_stage_ref_arch(rng):
    """PointRCNN with the reference-faithful canonical head (SA_CONFIG
    present -> roipoint first-K pooling + xyz_up/merge_down + SA stack):
    forward+loss+grad+predict at small shapes — the train-path complement
    to the eval-mode e2e torch parity (`test_pointrcnn_e2e_parity`)."""
    ds = CfgNode({'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
                  'NUM_POINT_FEATURES': 4})
    cfg = pointrcnn_cfg()
    cfg.ROI_HEAD.update({
        'USE_BN': False, 'DP_RATIO': 0.0,
        'ROI_POINT_POOL': {'POOL_EXTRA_WIDTH': [0.0, 0.0, 0.0],
                           'NUM_SAMPLED_POINTS': 32,
                           'DEPTH_NORMALIZER': 70.0},
        'XYZ_UP_LAYER': [16, 8],
        'SA_CONFIG': {'NPOINTS': [16, 8, -1], 'RADIUS': [0.5, 1.0, 100],
                      'NSAMPLE': [8, 8, 8],
                      'MLPS': [[16, 16], [16, 16], [16, 32]]},
    })
    model = build_network(cfg, num_class=3, dataset_cfg=ds)
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)},
                           batch, training=False)
    assert 'sa_0' in variables['params']['roi_head']
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(2)},
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert 'rcnn_cls_loss' in tb

    g = jax.grad(lambda p: model.apply(
        {'params': p, 'batch_stats': variables['batch_stats']}, batch,
        training=True, mutable=['batch_stats'],
        rngs={'targets': jax.random.PRNGKey(3)},
        method=model.forward_with_loss)[0][0])(variables['params'])
    for name in ('xyz_up_0', 'merge_down_0', 'sa_0', 'sa_2_mlp_0',
                 'cls_fc'):
        total = sum(np.abs(np.asarray(v)).sum() for v in
                    jax.tree_util.tree_leaves(g['roi_head'][name]))
        assert np.isfinite(total) and total > 0, name
    # reg loss may be zero-weighted when random-init proposals miss the
    # REG_FG_THRESH IoU; grads must still be finite
    total = sum(np.abs(np.asarray(v)).sum() for v in
                jax.tree_util.tree_leaves(g['roi_head']['reg_fc']))
    assert np.isfinite(total)
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[2] == 7
