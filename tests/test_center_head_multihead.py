"""Multi-head CenterHead grouping, IoU branch/losses, and NMS variants.

Covers the reference's `CLASS_NAMES_EACH_HEAD` multi-head mode
(`center_head.py:49-104`), the IoU rectification losses
(`loss_utils.py:610-648` — DIoU parity-checked against the torch reference),
and `multi_classes_nms` / `class_specific_nms` (`model_nms_utils.py:28-108`).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.models.dense_heads.center_head import CenterHead
from pdm_ssd_tpu.models import model_nms
from pdm_ssd_tpu.ops import iou3d, losses
from pdm_ssd_tpu.utils.config import CfgNode

PC = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)


def _head_cfg(groups, extra_heads=None, iou_rect=False):
    head_dict = {
        'center': {'out_channels': 2, 'num_conv': 2},
        'center_z': {'out_channels': 1, 'num_conv': 2},
        'dim': {'out_channels': 3, 'num_conv': 2},
        'rot': {'out_channels': 2, 'num_conv': 2},
    }
    if extra_heads:
        head_dict.update(extra_heads)
    pp = {'SCORE_THRESH': 0.0, 'POST_CENTER_LIMIT_RANGE': [0, -40, -3, 70.4, 40, 1],
          'MAX_OBJ_PER_SAMPLE': 16}
    if iou_rect:
        pp['USE_IOU_TO_RECTIFY_SCORE'] = True
        pp['IOU_RECTIFIER'] = [0.68, 0.71, 0.65]
    return CfgNode({
        'CLASS_NAMES_EACH_HEAD': groups,
        'SHARED_CONV_CHANNEL': 16,
        'NUM_HM_CONV': 2,
        'SEPARATE_HEAD_CFG': {'HEAD_ORDER': ['center', 'center_z', 'dim', 'rot'],
                              'HEAD_DICT': head_dict},
        'TARGET_ASSIGNER_CONFIG': {'FEATURE_MAP_STRIDE': 1, 'NUM_MAX_OBJS': 8,
                                   'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 2.0,
            'code_weights': [1.0] * 8}},
        'IOU_REG_LOSS': iou_rect,
        'POST_PROCESSING': pp,
    })


def _make_head(groups, **kw):
    return CenterHead(model_cfg=_head_cfg(groups, **kw), input_channels=16,
                      num_class=3, grid_size=(44, 50),
                      point_cloud_range=PC, voxel_size=(1.6, 1.6),
                      class_names=('Car', 'Pedestrian', 'Cyclist'))


def _gt():
    gt = np.zeros((2, 6, 8), np.float32)
    gt[:, :, 0] = np.linspace(10, 60, 6)
    gt[:, :, 1] = np.linspace(-20, 20, 6)
    gt[:, :, 2] = -1.0
    gt[:, :, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :, 7] = [1, 2, 3, 1, 2, 3]
    mask = np.ones((2, 6), bool)
    return jnp.asarray(gt), jnp.asarray(mask)


def test_multihead_forward_and_loss():
    head = _make_head([['Car'], ['Pedestrian', 'Cyclist']])
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 44, 16))
    variables = head.init(jax.random.PRNGKey(1), {'spatial_features_2d': x})
    out = head.apply(variables, {'spatial_features_2d': x})
    preds = out['center_head_preds']
    assert len(preds) == 2
    assert preds[0]['hm'].shape[-1] == 1    # Car head
    assert preds[1]['hm'].shape[-1] == 2    # Ped/Cyc head

    gt, mask = _gt()
    targets = head.assign_targets(gt, mask, (50, 44))
    assert len(targets) == 2
    # Car head sees only class-1 objects
    assert int(targets[0]['masks'].sum()) == 4   # 2 batches x 2 cars
    assert int(targets[1]['masks'].sum()) == 8   # 2 x (2 peds + 2 cyc)
    loss, tb = head.get_loss(out, targets)
    assert np.isfinite(float(loss))
    assert 'hm_loss_head_0' in tb and 'hm_loss_head_1' in tb


def test_multihead_decode_global_labels():
    head = _make_head([['Car'], ['Pedestrian', 'Cyclist']])
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 50, 44, 16))
    variables = head.init(jax.random.PRNGKey(3), {'spatial_features_2d': x})
    out = head.apply(variables, {'spatial_features_2d': x})
    dec = head.apply(variables, out, method=head.generate_predicted_boxes)
    # 16 per head, concatenated
    assert dec['pred_boxes'].shape == (1, 32, 7)
    labels = np.asarray(dec['pred_labels'])
    assert set(np.unique(labels[:, :16])) <= {0}        # Car head -> global 0
    assert set(np.unique(labels[:, 16:])) <= {1, 2}     # Ped/Cyc head -> 1, 2


def test_iou_branch_losses_and_rectification():
    head = _make_head([['Car', 'Pedestrian', 'Cyclist']],
                      extra_heads={'iou': {'out_channels': 1, 'num_conv': 2}},
                      iou_rect=True)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 50, 44, 16))
    variables = head.init(jax.random.PRNGKey(5), {'spatial_features_2d': x})
    out = head.apply(variables, {'spatial_features_2d': x})
    gt, mask = _gt()
    targets = head.assign_targets(gt, mask, (50, 44))
    loss, tb = head.get_loss(out, targets)
    assert 'iou_loss' in tb and 'iou_reg_loss' in tb
    assert np.isfinite(float(loss))
    dec = head.apply(variables, out, method=head.generate_predicted_boxes)
    assert np.isfinite(np.asarray(dec['pred_scores'])).all()

    # gradient flows through both iou losses
    def loss_fn(p):
        o = head.apply({'params': p, 'batch_stats': variables['batch_stats']},
                       {'spatial_features_2d': x})
        l, _ = head.get_loss(o, targets)
        return l
    g = jax.grad(loss_fn)(variables['params'])
    total = sum(np.abs(np.asarray(v)).sum() for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_diou_matches_torch_reference():
    torch = pytest.importorskip('torch')
    import ref_oracle
    ref_diou = ref_oracle.load('pcdet.utils.box_utils').bbox3d_overlaps_diou

    rng = np.random.RandomState(0)
    n = 64
    pred = np.concatenate([
        rng.uniform(0, 60, (n, 2)), rng.uniform(-2, 0, (n, 1)),
        rng.uniform(1, 5, (n, 3)), rng.uniform(-np.pi, np.pi, (n, 1))], 1).astype(np.float32)
    gt = pred + rng.normal(0, 0.5, pred.shape).astype(np.float32)
    gt[:, 3:6] = np.abs(gt[:, 3:6]) + 0.1
    ours = np.asarray(iou3d.bbox3d_overlaps_diou(jnp.asarray(pred), jnp.asarray(gt)))
    theirs = ref_diou(torch.from_numpy(pred), torch.from_numpy(gt)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def _boxes_for_nms():
    rng = np.random.RandomState(1)
    n = 64
    boxes = np.concatenate([
        rng.uniform(5, 65, (n, 2)), np.full((n, 1), -1.0),
        np.tile([3.9, 1.6, 1.56], (n, 1)), rng.uniform(-np.pi, np.pi, (n, 1))], 1)
    scores = rng.rand(n).astype(np.float32)
    labels = rng.randint(1, 4, n)
    return (jnp.asarray(boxes, jnp.float32), jnp.asarray(scores),
            jnp.asarray(labels, jnp.int32))


def test_multi_classes_nms_per_class_isolation():
    """Per-class NMS never suppresses across classes and labels match columns."""
    boxes, scores, _ = _boxes_for_nms()
    probs = jax.random.uniform(jax.random.PRNGKey(6), (boxes.shape[0], 3))
    cfg = CfgNode({'NMS_TYPE': 'multi_classes_nms', 'NMS_THRESH': 0.1,
                   'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 8})
    b, s, l, k = model_nms.multi_classes_nms(probs, boxes, cfg, score_thresh=0.1)
    assert b.shape == (24, 7) and s.shape == (24,)
    l = np.asarray(l)
    k = np.asarray(k).astype(bool)
    assert set(np.unique(l[k[:8] if False else k])) <= {1, 2, 3}
    # slots 0..7 are class 1, 8..15 class 2, 16..23 class 3
    for c in range(3):
        seg = l[c * 8:(c + 1) * 8]
        kk = k[c * 8:(c + 1) * 8]
        assert set(np.unique(seg[kk])) <= {c + 1}
        # kept scores are >= thresh and sorted descending within class
        ss = np.asarray(s)[c * 8:(c + 1) * 8][kk]
        assert (ss >= 0.1).all()
        assert (np.diff(ss) <= 1e-6).all()


def test_class_specific_nms_per_class_config():
    boxes, scores, labels = _boxes_for_nms()
    valid = jnp.ones_like(scores, bool)
    cfg = CfgNode({'NMS_TYPE': 'class_specific_nms',
                   'NMS_THRESH': [0.1, 0.3, 0.5],
                   'NMS_PRE_MAXSIZE': [32, 16, 16],
                   'NMS_POST_MAXSIZE': [8, 4, 4]})
    b, s, l, k = model_nms.class_specific_nms(
        boxes, scores, labels, valid, cfg, 3, score_thresh=[0.05, 0.1, 0.2])
    assert b.shape == (16, 7)
    l, k = np.asarray(l), np.asarray(k).astype(bool)
    assert set(np.unique(l[:8][k[:8]])) <= {1}
    assert set(np.unique(l[8:12][k[8:12]])) <= {2}
    assert set(np.unique(l[12:][k[12:]])) <= {3}
    # suppression within a class: no two kept class-1 boxes overlap > 0.1
    kept1 = np.asarray(b)[:8][k[:8]]
    if len(kept1) > 1:
        ious = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(kept1), jnp.asarray(kept1)))
        off = ious - np.eye(len(kept1))
        assert off.max() <= 0.1 + 1e-4
