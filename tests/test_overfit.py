"""Learning-stack correctness: the tiny grid-native PDM-SSD must overfit a
single synthetic batch — loss drops sharply and the trained model detects the
planted objects. Exercises target assignment + losses + optimizer end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.models import build_network
from pdm_ssd_tpu.runtime import trainer


def grid_tiny_cfg():
    return CfgNode({
        'NAME': 'PDMSSD',
        'BACKBONE_3D': {'NAME': 'GridPointBackbone', 'CELL_SIZE': 0.8,
                        'GRID_SIZE': [40, 40], 'NUM_FILTERS': [16, 32],
                        'LAYER_NUMS': [1, 1]},
        'PDM_NECK': {'NAME': 'PDMNeckConv', 'WINDOW': 5, 'NUM_BEV_FEATURES': 16,
                     'NUM_Z_BINS': 2, 'GAUSSIAN_SIGMA': 1.2,
                     'BEV_SIZE': [20, 20], 'VOXEL_SIZE': [1.6, 1.6, 1.0]},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1],
                        'LAYER_STRIDES': [1], 'NUM_FILTERS': [32],
                        'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [32]},
        'DENSE_HEAD': {
            'NAME': 'CenterHead', 'CLASS_AGNOSTIC': False,
            'CLASS_NAMES_EACH_HEAD': [['Car', 'Pedestrian', 'Cyclist']],
            'SHARED_CONV_CHANNEL': 32, 'NUM_HM_CONV': 2,
            'SEPARATE_HEAD_CFG': {
                'HEAD_ORDER': ['center', 'center_z', 'dim', 'rot'],
                'HEAD_DICT': {
                    'center': {'out_channels': 2, 'num_conv': 2},
                    'center_z': {'out_channels': 1, 'num_conv': 2},
                    'dim': {'out_channels': 3, 'num_conv': 2},
                    'rot': {'out_channels': 2, 'num_conv': 2}}},
            'TARGET_ASSIGNER_CONFIG': {'FEATURE_MAP_STRIDE': 1,
                                       'NUM_MAX_OBJS': 8,
                                       'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 1},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'code_weights': [1.0] * 8}},
            'POST_PROCESSING': {'SCORE_THRESH': 0.15,
                                'POST_CENTER_LIMIT_RANGE': [0, -16, -3, 32, 16, 1],
                                'MAX_OBJ_PER_SAMPLE': 8}},
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.15, 'SCORE_CALIBRATION': False,
            'USE_VOTE_BOXES': False,
            'NMS_CONFIG': {'NMS_TYPE': 'circle_nms', 'NMS_RADIUS': 2.0,
                           'NMS_PRE_MAXSIZE': 16, 'NMS_POST_MAXSIZE': 8}},
    })


def test_overfit_single_batch(rng):
    ds_cfg = CfgNode({'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
                      'NUM_POINT_FEATURES': 4})
    model = build_network(grid_tiny_cfg(), num_class=3, dataset_cfg=ds_cfg)

    # two planted cars with dense interior points
    B, N = 2, 512
    gt = np.zeros((B, 2, 8), np.float32)
    gt[0, 0] = [10.0, 4.0, -1.0, 3.9, 1.6, 1.56, 0.3, 1]
    gt[0, 1] = [24.0, -6.0, -1.0, 3.9, 1.6, 1.56, -0.8, 1]
    gt[1] = gt[0]
    pts = []
    for b in range(B):
        obj = []
        for g in gt[b]:
            local = rng.uniform(-0.45, 0.45, (N // 4, 3)) * g[3:6]
            c, s = np.cos(g[6]), np.sin(g[6])
            gx = local[:, 0] * c - local[:, 1] * s + g[0]
            gy = local[:, 0] * s + local[:, 1] * c + g[1]
            obj.append(np.stack([gx, gy, local[:, 2] + g[2],
                                 np.ones(N // 4)], 1))
        bg = np.stack([rng.uniform(0, 32, N // 2), rng.uniform(-16, 16, N // 2),
                       rng.uniform(-2, 0, N // 2), np.zeros(N // 2)], 1)
        pts.append(np.concatenate(obj + [bg]))
    batch = {'points': jnp.asarray(np.stack(pts), jnp.float32),
             'gt_boxes': jnp.asarray(gt), 'gt_mask': jnp.ones((B, 2), bool)}

    opt_cfg = CfgNode({'OPTIMIZER': 'adam_onecycle', 'LR': 0.01,
                       'WEIGHT_DECAY': 0.0, 'GRAD_NORM_CLIP': 10,
                       'PCT_START': 0.1})
    state, tx, _ = trainer.create_train_state(model, batch, opt_cfg, 200, 1)
    step = trainer.make_train_step(model, tx)
    losses = []
    for i in range(200):
        state, metrics = step(state, batch)
        losses.append(float(jax.device_get(metrics['loss'])))
    assert losses[-1] < 0.25 * losses[0], losses[::10]

    predict = trainer.make_predict_step(model)
    dets = jax.device_get(predict(state.params, state.batch_stats, batch))
    found = dets['pred_boxes'][0][dets['pred_mask'][0]]
    scores = dets['pred_scores'][0][dets['pred_mask'][0]]
    assert len(found) >= 2, (found, scores)
    # each planted car matched by center distance < 1.5 cells
    for g in gt[0]:
        d = np.linalg.norm(found[:, :2] - g[:2], axis=1)
        assert d.min() < 2.4, (g[:2], found[:, :2])
