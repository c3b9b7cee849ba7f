"""End-to-end model smoke tests on tiny shapes: init -> forward -> loss -> decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.models import build_network


def tiny_model_cfg():
    return CfgNode({
        'NAME': 'PDMSSD',
        'BACKBONE_3D': {
            'NAME': 'PointNet2MSG',
            'SA_CONFIG': {
                'NPOINTS': [64, 16],
                'RADIUS': [[0.5, 1.0], [1.0, 2.0]],
                'NSAMPLE': [[8, 8], [8, 8]],
                'MLPS': [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
                'USE_XYZ': True,
            },
            'FP_MLPS': [],
        },
        'POINT_HEAD': {
            'NAME': 'PointHeadBox',
            'CLS_FC': [16], 'REG_FC': [16],
            'CLASS_AGNOSTIC': False,
            'TARGET_CONFIG': {
                'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
                'BOX_CODER': 'PointResidualCoder',
                'BOX_CODER_CONFIG': {
                    'use_mean_size': True,
                    'mean_size': [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]],
                },
            },
            'LOSS_CONFIG': {
                'LOSS_REG': 'WeightedSmoothL1Loss',
                'LOSS_WEIGHTS': {'point_cls_weight': 1.0, 'point_box_weight': 1.0,
                                 'code_weights': [1.0] * 8},
            },
        },
        'PDM_NECK': {
            'NAME': 'PDMNeck', 'SOURCE_LEVEL': -1,
            'GRID_KERNEL': [3, 3, 3], 'NUM_BEV_FEATURES': 8,
            'BEV_SIZE': [44, 50], 'NUM_Z_BINS': 2,
            'VOXEL_SIZE': [1.6, 1.6, 2.0], 'GAUSSIAN_SIGMA': 1.0,
        },
        'BACKBONE_2D': {
            'NAME': 'BaseBEVBackbone',
            'LAYER_NUMS': [1], 'LAYER_STRIDES': [1], 'NUM_FILTERS': [16],
            'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [16],
        },
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
                    'rot': {'out_channels': 2, 'num_conv': 2},
                },
            },
            'TARGET_ASSIGNER_CONFIG': {
                'FEATURE_MAP_STRIDE': 1, 'NUM_MAX_OBJS': 8,
                'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2,
            },
            'LOSS_CONFIG': {
                'LOSS_WEIGHTS': {'cls_weight': 1.0, 'loc_weight': 2.0,
                                 'code_weights': [1.0] * 8},
            },
            'POST_PROCESSING': {
                'SCORE_THRESH': 0.1,
                'POST_CENTER_LIMIT_RANGE': [0, -40, -3, 70.4, 40, 1],
                'MAX_OBJ_PER_SAMPLE': 16,
            },
        },
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.01, 'SCORE_CALIBRATION': True,
            'CALIBRATION_RADIUS': 1.0, 'CALIBRATION_ALPHA': 0.5,
            'USE_VOTE_BOXES': True, 'VOTE_TOPK': 8,
            'NMS_CONFIG': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.1,
                           'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16},
        },
    })


def dataset_cfg():
    return CfgNode({'POINT_CLOUD_RANGE': [0, -40, -3, 70.4, 40, 1],
                    'NUM_POINT_FEATURES': 4})


def make_batch(rng, B=2, N=256, M=4):
    pts = np.stack([
        rng.uniform(0, 70.4, (B, N)),
        rng.uniform(-40, 40, (B, N)),
        rng.uniform(-3, 1, (B, N)),
        rng.rand(B, N),
    ], axis=-1).astype(np.float32)
    gt = np.zeros((B, M, 8), np.float32)
    gt[:, :, 0] = rng.uniform(5, 60, (B, M))
    gt[:, :, 1] = rng.uniform(-30, 30, (B, M))
    gt[:, :, 2] = -1.0
    gt[:, :, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :, 6] = rng.uniform(-np.pi, np.pi, (B, M))
    gt[:, :, 7] = rng.randint(1, 4, (B, M))
    gt_mask = np.ones((B, M), bool)
    gt_mask[:, -1] = False
    return {'points': jnp.asarray(pts), 'gt_boxes': jnp.asarray(gt),
            'gt_mask': jnp.asarray(gt_mask)}


@pytest.fixture(scope='module')
def model_and_vars():
    model = build_network(tiny_model_cfg(), num_class=3, dataset_cfg=dataset_cfg())
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch, training=False)
    return model, variables, batch


def test_forward_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    out = model.apply(variables, batch, training=False)
    assert out['point_features'].shape == (2, 16, 32)
    assert out['point_coords'].shape == (2, 16, 3)
    assert out['point_cls_preds'].shape == (2, 16, 3)
    assert out['point_box_preds'].shape == (2, 16, 8)
    assert out['spatial_features'].shape == (2, 50, 44, 2 * 9)
    assert out['spatial_features_2d'].shape == (2, 50, 44, 16)
    assert out['center_head_preds'][0]['hm'].shape == (2, 50, 44, 3)


def test_training_loss_finite(model_and_vars):
    model, variables, batch = model_and_vars
    out, mutated = model.apply(variables, batch, training=True,
                               mutable=['batch_stats'])
    loss, tb = model.apply(variables, out, method=model.get_training_loss)
    assert np.isfinite(float(loss))
    assert float(tb['hm_loss']) > 0
    assert float(tb['point_loss_cls']) > 0


def test_post_process_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    out = model.apply(variables, batch, training=False)
    dets = model.apply(variables, out, method=model.post_process)
    assert dets['pred_boxes'].shape == (2, 16, 7)
    assert dets['pred_scores'].shape == (2, 16)
    assert dets['pred_mask'].dtype == bool


def test_grads_flow(model_and_vars):
    model, variables, batch = model_and_vars

    def loss_fn(params):
        out, _ = model.apply(
            {'params': params, **{k: v for k, v in variables.items() if k != 'params'}},
            batch, training=True, mutable=['batch_stats'])
        loss, _ = model.apply(variables, out, method=model.get_training_loss)
        return loss

    grads = jax.grad(loss_fn)(variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_aux_head_variant(rng):
    """PDM-as-auxiliary-head (BASELINE config 3): PointHeadSimple supervises
    training and contributes loss; inference output is unaffected by it."""
    cfg = tiny_model_cfg()
    cfg['POINT_HEAD'] = CfgNode({
        'NAME': 'PointHeadSimple',
        'CLS_FC': [16],
        'CLASS_AGNOSTIC': True,
        'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {'point_cls_weight': 1.0}},
    })
    cfg.POST_PROCESSING['SCORE_CALIBRATION'] = False
    cfg.POST_PROCESSING['USE_VOTE_BOXES'] = False
    model = build_network(cfg, num_class=3, dataset_cfg=dataset_cfg())
    batch = make_batch(np.random.RandomState(0))
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch, training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert 'aux_point_loss_cls' in tb and float(tb['aux_point_loss_cls']) > 0
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[-1] == 7
