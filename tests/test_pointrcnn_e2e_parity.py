"""PointRCNN END-TO-END torch-oracle parity (VERDICT r3 item 4): the
reference's full two-stage stack — `PointNet2MSG` -> `PointHeadBox`
(per-point decode to proposals) -> proposal-layer NMS -> `PointRCNNHead`
canonical refinement — run on CPU through the shim family
(`ref_pointnet2_shim` for the pointnet2 kernels, `ref_cuda_shims` for
rotated NMS + roipoint pooling), against the JAX PointRCNN detector with
ported weights on a fixed cloud. Asserts:

  * identical proposal sets (rois) after class-agnostic NMS,
  * refinement head cls logits parity,
  * refined decoded boxes parity.

Reference: `pcdet/models/detectors/point_rcnn.py:4-30`,
`dense_heads/point_head_box.py:7-115`, `roi_heads/pointrcnn_head.py:9-179`,
`roi_heads/roi_head_template.py:45-102`.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

import ref_oracle
import ref_pointnet2_shim
import ref_cuda_shims

ref_oracle.install()


@pytest.fixture(scope='module', autouse=True)
def _cuda_shims():
    """Module-scoped torch.cuda monkeypatch (see test_backbone_parity)."""
    ref_pointnet2_shim.install()
    ref_cuda_shims.install()
    yield
    ref_pointnet2_shim.uninstall()

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.models import build_network

from test_backbone_parity import SA, FP, _randomize_bn, port_weights

B, N = 2, 128
MEAN_SIZES = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
ROI_POST = 16

ROI_HEAD = {
    'NAME': 'PointRCNNHead',
    'CLASS_AGNOSTIC': True,
    'USE_BN': False,
    'DP_RATIO': 0.0,
    'ROI_POINT_POOL': {'POOL_EXTRA_WIDTH': [0.0, 0.0, 0.0],
                       'NUM_SAMPLED_POINTS': 32, 'DEPTH_NORMALIZER': 70.0},
    'XYZ_UP_LAYER': [16, 8],
    'SA_CONFIG': {'NPOINTS': [16, 8, -1], 'RADIUS': [0.5, 1.0, 100],
                  'NSAMPLE': [8, 8, 8],
                  'MLPS': [[16, 16], [16, 16], [16, 32]]},
    'CLS_FC': [16], 'REG_FC': [16],
    'NMS_CONFIG': {
        'TRAIN': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                  'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': ROI_POST,
                  'NMS_THRESH': 0.8},
        'TEST': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                 'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': ROI_POST,
                 'NMS_THRESH': 0.85}},
    'TARGET_CONFIG': {'BOX_CODER': 'ResidualCoder',
                      'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
                      'HARD_BG_RATIO': 0.8, 'CLS_SCORE_TYPE': 'cls',
                      'CLS_FG_THRESH': 0.6, 'CLS_BG_THRESH': 0.45,
                      'CLS_BG_THRESH_LO': 0.1, 'REG_FG_THRESH': 0.55},
    'LOSS_CONFIG': {'CLS_LOSS': 'BinaryCrossEntropy',
                    'REG_LOSS': 'smooth-l1',
                    'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0,
                                     'rcnn_reg_weight': 1.0,
                                     'code_weights': [1.0] * 7}},
}

POINT_HEAD = {
    'NAME': 'PointHeadBox',
    'CLS_FC': [16], 'REG_FC': [16],
    'CLASS_AGNOSTIC': False,
    'USE_POINT_FEATURES_BEFORE_FUSION': False,
    'TARGET_CONFIG': {
        'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
        'BOX_CODER': 'PointResidualCoder',
        'BOX_CODER_CONFIG': {'use_mean_size': True,
                             'mean_size': [list(m) for m in MEAN_SIZES]}},
    'LOSS_CONFIG': {'LOSS_REG': 'WeightedSmoothL1Loss',
                    'LOSS_WEIGHTS': {'point_cls_weight': 1.0,
                                     'point_box_weight': 1.0,
                                     'code_weights': [1.0] * 8}},
}


def jax_cfg():
    return CfgNode({
        'NAME': 'PointRCNN',
        'BACKBONE_3D': dict({'NAME': 'PointNet2MSG',
                             'FP_MLPS': [list(m) for m in FP]},
                            SA_CONFIG=dict(SA)),
        'POINT_HEAD': dict(POINT_HEAD),
        'ROI_HEAD': dict(ROI_HEAD),
        'POST_PROCESSING': {
            'RECALL_THRESH_LIST': [0.3, 0.5, 0.7], 'SCORE_THRESH': 0.1,
            'EVAL_METRIC': 'kitti',
            'NMS_CONFIG': {'NMS_TYPE': 'nms_bev', 'NMS_THRESH': 0.1,
                           'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16}},
    })


def ds_cfg():
    return CfgNode({'POINT_CLOUD_RANGE': [-4, -4, -3, 4, 4, 1],
                    'NUM_POINT_FEATURES': 4, 'DATA_PROCESSOR': []})


def build_torch_stack(rng):
    ED = ref_oracle._EasyDict
    bb_mod = ref_oracle.load('pcdet.models.backbones_3d.pointnet2_backbone')
    ph_mod = ref_oracle.load('pcdet.models.dense_heads.point_head_box')
    rh_mod = ref_oracle.load('pcdet.models.roi_heads.pointrcnn_head')

    torch.manual_seed(3)
    bb_cfg = ED({'SA_CONFIG': ED({k: v for k, v in SA.items()}),
                 'FP_MLPS': [list(m) for m in FP]})
    backbone = bb_mod.PointNet2MSG(model_cfg=bb_cfg, input_channels=4)
    point_head = ph_mod.PointHeadBox(num_class=3,
                                     input_channels=FP[0][-1],
                                     model_cfg=ED(POINT_HEAD),
                                     predict_boxes_when_training=False)
    roi_head = rh_mod.PointRCNNHead(input_channels=FP[0][-1],
                                    model_cfg=ED(ROI_HEAD), num_class=1)
    for net in (backbone, point_head, roi_head):
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                _randomize_bn(m, rng)
        net.eval()
    return backbone, point_head, roi_head


def copy_fcstack(seq, tgt_p, tgt_bs):
    """torch make_fc_layers Sequential -> FCStack params (Dense_k/BatchNorm_k
    + final biased Dense)."""
    lin = [m for m in seq
           if isinstance(m, (torch.nn.Linear, torch.nn.Conv1d))]
    bns = [m for m in seq if isinstance(m, torch.nn.BatchNorm1d)]
    for j, (cv, bn) in enumerate(zip(lin[:-1], bns)):
        w = cv.weight.detach().numpy()
        if w.ndim == 3:
            w = w[:, :, 0]
        tgt_p[f'Dense_{j}']['kernel'] = w.T
        tgt_p[f'BatchNorm_{j}'] = {'scale': bn.weight.detach().numpy(),
                                   'bias': bn.bias.detach().numpy()}
        tgt_bs[f'BatchNorm_{j}'] = {'mean': bn.running_mean.numpy(),
                                    'var': bn.running_var.numpy()}
    last = lin[-1]
    w = last.weight.detach().numpy()
    if w.ndim == 3:
        w = w[:, :, 0]
    tgt_p[f'Dense_{len(bns)}']['kernel'] = w.T
    tgt_p[f'Dense_{len(bns)}']['bias'] = last.bias.detach().numpy()


def copy_shared_mlp(seq, tgt_p, tgt_bs):
    convs = [m for m in seq if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in seq if isinstance(m, torch.nn.BatchNorm2d)]
    for j, (cv, bn) in enumerate(zip(convs, bns)):
        tgt_p[f'Dense_{j}']['kernel'] = \
            cv.weight.detach().numpy()[:, :, 0, 0].T
        tgt_p[f'BatchNorm_{j}'] = {'scale': bn.weight.detach().numpy(),
                                   'bias': bn.bias.detach().numpy()}
        tgt_bs[f'BatchNorm_{j}'] = {'mean': bn.running_mean.numpy(),
                                    'var': bn.running_var.numpy()}


def test_pointrcnn_e2e_parity(rng):
    backbone, point_head, roi_head = build_torch_stack(rng)

    pts = rng.uniform(-3.5, 3.5, size=(B, N, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2.5, 0.5, size=(B, N)).astype(np.float32)
    feat = rng.randn(B, N, 1).astype(np.float32)

    # ---- torch end-to-end (stacked layout)
    batch_idx = np.repeat(np.arange(B, dtype=np.float32), N)[:, None]
    tpoints = torch.from_numpy(np.concatenate(
        [batch_idx, pts.reshape(-1, 3), feat.reshape(-1, 1)],
        axis=1)).contiguous()
    with torch.no_grad():
        tb = backbone({'batch_size': B, 'points': tpoints})
        tb = point_head(tb)
        tb = roi_head(tb)
    t_rois = tb['rois'].numpy()                             # (B, R, 7)
    t_roi_labels = tb['roi_labels'].numpy()
    t_cls = tb['batch_cls_preds'].numpy()                   # (B, R, 1)
    t_boxes = tb['batch_box_preds'].numpy()                 # (B, R, 7)

    # ---- JAX with ported weights
    cfg, ds = jax_cfg(), ds_cfg()
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    jbatch = {'points': jnp.asarray(np.concatenate([pts, feat], -1))}
    variables = model.init({'params': jax.random.PRNGKey(0)}, jbatch,
                           training=False)
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(np.asarray, variables['batch_stats'])

    pb, sb = port_weights(backbone, params['backbone_3d'],
                          stats['backbone_3d'])
    params['backbone_3d'] = jax.tree_util.tree_map(np.asarray, pb)
    stats['backbone_3d'] = jax.tree_util.tree_map(np.asarray, sb)

    copy_fcstack(point_head.cls_layers, params['point_head']['cls_layers'],
                 stats['point_head']['cls_layers'])
    copy_fcstack(point_head.box_layers, params['point_head']['box_layers'],
                 stats['point_head']['box_layers'])

    rp, rs = params['roi_head'], stats['roi_head']
    xyz_lin = [m for m in roi_head.xyz_up_layer
               if isinstance(m, torch.nn.Conv2d)]
    for j, cv in enumerate(xyz_lin):
        rp[f'xyz_up_{j}'] = {
            'kernel': cv.weight.detach().numpy()[:, :, 0, 0].T,
            'bias': cv.bias.detach().numpy()}
    md = roi_head.merge_down_layer[0]
    rp['merge_down_0'] = {'kernel': md.weight.detach().numpy()[:, :, 0, 0].T,
                          'bias': md.bias.detach().numpy()}
    for k, sa in enumerate(roi_head.SA_modules):
        if k < 2:
            copy_shared_mlp(sa.mlps[0], rp[f'sa_{k}']['mlp_0'],
                            rs[f'sa_{k}']['mlp_0'])
        else:
            copy_shared_mlp(sa.mlps[0], rp[f'sa_{k}_mlp_0'],
                            rs[f'sa_{k}_mlp_0'])
    copy_fcstack(roi_head.cls_layers, rp['cls_fc'], rs['cls_fc'])
    copy_fcstack(roi_head.reg_layers, rp['reg_fc'], rs['reg_fc'])

    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params),
                 'batch_stats': jax.tree_util.tree_map(jnp.asarray, stats)}
    out = model.apply(variables, jbatch, training=False)

    # ---- proposal parity (set AND order)
    j_rois = np.asarray(out['rois'])
    j_mask = np.asarray(out['roi_mask'])
    for b in range(B):
        n_t = int((np.abs(t_rois[b]).sum(1) > 0).sum())
        assert int(j_mask[b].sum()) == n_t, (b, int(j_mask[b].sum()), n_t)
        np.testing.assert_allclose(j_rois[b][:n_t], t_rois[b][:n_t],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(out['roi_labels'])[b][:n_t], t_roi_labels[b][:n_t])

    # ---- refinement parity: cls logits + decoded boxes (valid rois only)
    j_cls = np.asarray(out['rcnn_cls_preds'])
    from pdm_ssd_tpu.models.roi_heads.pointrcnn_head import PointRCNNHead
    j_boxes = np.asarray(PointRCNNHead(
        model_cfg=cfg.ROI_HEAD, num_class=1).generate_predicted_boxes(
        out['rois'], out['rcnn_cls_preds'], out['rcnn_reg_preds'])[0])
    for b in range(B):
        m = j_mask[b]
        np.testing.assert_allclose(j_cls[b][m], t_cls[b][m], rtol=1e-3,
                                   atol=2e-4)
        np.testing.assert_allclose(j_boxes[b][m], t_boxes[b][m], rtol=1e-3,
                                   atol=2e-3)
