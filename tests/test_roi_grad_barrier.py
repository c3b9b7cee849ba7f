"""ROI refinement must not backprop into stage-1 proposals, and the
corner-loss regularization branch must be live and NaN-safe.

The reference generates proposals under `@torch.no_grad()`
(`pcdet/models/roi_heads/roi_head_template.py:45`) — stage-1 is trained by
its own losses only. Round 5 root-caused the sparse PV-RCNN divergence
(refinement loss climbs then NaNs by ~epoch 18, BENCH_NOTES) to refinement
gradients leaking back through ROI geometry; these tests pin the barrier.

Corner loss: `CORNER_LOSS_REGULARIZATION` per
`pcdet/models/roi_heads/roi_head_template.py` `get_box_reg_layer_loss`
corner branch; NaN-safety at coincident corners (norm gradient at 0).
"""
import jax
import jax.numpy as jnp
import numpy as np

from pdm_ssd_tpu.models.roi_heads.roi_head_template import RoIHeadTemplate
from pdm_ssd_tpu.ops import losses
from pdm_ssd_tpu.utils.config import CfgNode


def _head(corner=False):
    cfg = CfgNode({
        'NMS_CONFIG': {
            'TRAIN': {'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16,
                      'NMS_THRESH': 0.8},
            'TEST': {'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16,
                     'NMS_THRESH': 0.7},
        },
        'TARGET_CONFIG': {
            'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
            'CLS_FG_THRESH': 0.6, 'CLS_BG_THRESH': 0.45,
            'CLS_BG_THRESH_LO': 0.1, 'REG_FG_THRESH': 0.55,
            'HARD_BG_RATIO': 0.8,
        },
        'LOSS_CONFIG': {
            'CORNER_LOSS_REGULARIZATION': corner,
            'LOSS_WEIGHTS': {
                'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                'rcnn_corner_weight': 1.0,
                'code_weights': [1.0] * 7,
            },
        },
    })
    return RoIHeadTemplate(model_cfg=cfg, num_class=1)


def _stage1_batch(rng, B=2, N=32):
    boxes = np.zeros((B, N, 7), np.float32)
    boxes[..., 0] = rng.uniform(5, 60, (B, N))
    boxes[..., 1] = rng.uniform(-20, 20, (B, N))
    boxes[..., 2] = -1.0
    boxes[..., 3:6] = np.array([3.9, 1.6, 1.56]) * rng.uniform(
        0.8, 1.2, (B, N, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (B, N))
    cls = rng.randn(B, N, 1).astype(np.float32)
    gt = np.zeros((B, 4, 8), np.float32)
    gt[..., :7] = boxes[:, :4, :7] + rng.randn(B, 4, 7) * 0.05
    gt[..., 7] = 1.0
    return boxes, cls, gt


def test_no_gradient_into_stage1_proposals(rng):
    """d(rcnn loss)/d(batch_box_preds) == 0 exactly: the proposal layer is a
    gradient barrier like the reference's no_grad."""
    head = _head(corner=True)
    boxes, cls, gt = _stage1_batch(rng)
    key = jax.random.PRNGKey(0)

    def rcnn_loss(stage1_boxes, stage1_cls):
        batch = {
            'batch_box_preds': stage1_boxes, 'batch_cls_preds': stage1_cls,
            'gt_boxes': jnp.asarray(gt),
            'gt_mask': jnp.ones((gt.shape[0], gt.shape[1]), bool),
        }
        batch = head.proposal_layer(batch, training=True)
        targets = head.assign_targets(batch, rng_key=key)
        rois = targets['rois']
        # rcnn preds that DEPEND on roi geometry, as pooled features do:
        # any leak through rois must show up in the gradient
        feat = jnp.tanh(rois).reshape(rois.shape[0], rois.shape[1], -1)
        batch['rcnn_cls_preds'] = feat[..., :1] * 0.3
        batch['rcnn_reg_preds'] = jnp.tile(feat[..., :1], (1, 1, 7)) * 0.1
        total, tb = head.get_loss(batch, targets)
        return total, tb

    (loss, tb), grads = jax.value_and_grad(rcnn_loss, argnums=(0, 1),
                                           has_aux=True)(
        jnp.asarray(boxes), jnp.asarray(cls))
    assert np.isfinite(float(loss))
    assert float(tb['rcnn_corner_loss']) >= 0
    for g in grads:
        np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_corner_loss_branch_live_and_finite(rng):
    """tb reports a finite rcnn_corner_loss and its gradient w.r.t. the
    refinement predictions is finite even when predictions exactly hit the
    targets (coincident-corner norm gradient)."""
    head = _head(corner=True)
    boxes, cls, gt = _stage1_batch(rng)
    key = jax.random.PRNGKey(1)
    batch = {
        'batch_box_preds': jnp.asarray(boxes),
        'batch_cls_preds': jnp.asarray(cls),
        'gt_boxes': jnp.asarray(gt),
        'gt_mask': jnp.ones((gt.shape[0], gt.shape[1]), bool),
    }
    batch = head.proposal_layer(batch, training=True)
    targets = head.assign_targets(batch, rng_key=key)
    B, R = targets['rois'].shape[:2]

    def loss_of(reg_preds):
        b = dict(batch)
        b['rcnn_cls_preds'] = jnp.zeros((B, R, 1))
        b['rcnn_reg_preds'] = reg_preds
        total, tb = head.get_loss(b, targets)
        return total, tb

    # exact-hit case: reg preds == encoded targets -> corners coincide
    exact = targets['rcnn_reg_targets']
    (l0, tb0), g0 = jax.value_and_grad(loss_of, has_aux=True)(exact)
    assert np.isfinite(float(l0))
    assert np.isfinite(float(tb0['rcnn_corner_loss']))
    assert np.all(np.isfinite(np.asarray(g0)))

    (l1, tb1), g1 = jax.value_and_grad(loss_of, has_aux=True)(
        exact + 0.1)
    assert float(tb1['rcnn_corner_loss']) > float(tb0['rcnn_corner_loss'])
    assert np.all(np.isfinite(np.asarray(g1)))

    # corner branch off: key absent from tb
    head_off = _head(corner=False)
    _, tb_off = head_off.get_loss(
        {'rcnn_cls_preds': jnp.zeros((B, R, 1)),
         'rcnn_reg_preds': exact}, targets)
    assert 'rcnn_corner_loss' not in tb_off
