"""Golden-stage parity: my JAX stages vs the PyTorch reference run on CPU.

The reference (`/root/reference/pcdet`) is imported through tests/ref_oracle.py
(CUDA exts / numba / spconv stubbed; numba functions run as plain Python).
Covered stages, each on randomized inputs:

- ResidualCoder / PointResidualCoder   vs `pcdet/utils/box_coder_utils.py`
- sigmoid focal + weighted smooth-L1   vs `pcdet/utils/loss_utils.py`
- CenterHead Gaussian target assignment vs `center_head.py:106-162`
- AxisAlignedTargetAssigner            vs `axis_aligned_target_assigner.py`
- full KITTI AP protocol               vs `kitti_object_eval_python/eval.py`
  (both sides share one rotated-IoU backend so the MATCHER/AP logic is what's
  under test; the IoU itself has its own Monte-Carlo suite in test_iou3d.py)
"""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_oracle  # noqa: E402

torch = pytest.importorskip('torch')


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


# ---------------------------------------------------------------- box coders

def test_residual_coder_parity(rng):
    ref_bc = ref_oracle.load('pcdet.utils.box_coder_utils')
    from pdm_ssd_tpu.ops.coders import ResidualCoder

    boxes = rng.rand(64, 7).astype(np.float32) + 0.5
    anchors = rng.rand(64, 7).astype(np.float32) + 0.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 64)
    anchors[:, 6] = rng.uniform(-np.pi, np.pi, 64)

    for sincos in [False, True]:
        mine = ResidualCoder(code_size=7, encode_angle_by_sincos=sincos)
        ref = ref_bc.ResidualCoder(code_size=7, encode_angle_by_sincos=sincos)
        enc_ref = ref.encode_torch(_t(boxes), _t(anchors)).numpy()
        enc_mine = np.asarray(mine.encode(jnp.asarray(boxes), jnp.asarray(anchors)))
        np.testing.assert_allclose(enc_mine, enc_ref, atol=2e-5)
        dec_ref = ref.decode_torch(_t(enc_ref), _t(anchors)).numpy()
        dec_mine = np.asarray(mine.decode(jnp.asarray(enc_ref), jnp.asarray(anchors)))
        np.testing.assert_allclose(dec_mine, dec_ref, atol=2e-5)


def test_point_residual_coder_parity(rng):
    ref_bc = ref_oracle.load('pcdet.utils.box_coder_utils')
    from pdm_ssd_tpu.ops.coders import PointResidualCoder

    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
    mine = PointResidualCoder(code_size=8, use_mean_size=True,
                              mean_size=tuple(map(tuple, mean_size)))
    ref = ref_bc.PointResidualCoder(code_size=8, use_mean_size=True,
                                    mean_size=mean_size)

    N = 128
    gt = rng.rand(N, 7).astype(np.float32) + 0.5
    gt[:, 6] = rng.uniform(-np.pi, np.pi, N)
    pts = rng.rand(N, 3).astype(np.float32) * 10
    cls = rng.randint(1, 4, N).astype(np.int32)

    enc_ref = ref.encode_torch(_t(gt), _t(pts), torch.from_numpy(cls)).numpy()
    enc_mine = np.asarray(mine.encode(jnp.asarray(gt), jnp.asarray(pts), jnp.asarray(cls)))
    np.testing.assert_allclose(enc_mine, enc_ref, atol=2e-5)

    dec_ref = ref.decode_torch(_t(enc_ref), _t(pts),
                               torch.from_numpy(cls)).numpy()
    dec_mine = np.asarray(mine.decode(jnp.asarray(enc_ref), jnp.asarray(pts), jnp.asarray(cls)))
    np.testing.assert_allclose(dec_mine, dec_ref, atol=2e-5)


# ------------------------------------------------------------------- losses

def test_sigmoid_focal_loss_parity(rng):
    lu = ref_oracle.load('pcdet.utils.loss_utils')
    from pdm_ssd_tpu.ops import losses

    B, N, C = 2, 50, 3
    logits = rng.randn(B, N, C).astype(np.float32) * 3
    target = (rng.rand(B, N, C) > 0.7).astype(np.float32)
    weights = rng.rand(B, N).astype(np.float32)

    ref = lu.SigmoidFocalClassificationLoss(gamma=2.0, alpha=0.25)(
        _t(logits), _t(target), _t(weights)).numpy()
    mine = np.asarray(losses.sigmoid_focal_loss(logits, target, weights))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_weighted_smooth_l1_parity(rng):
    lu = ref_oracle.load('pcdet.utils.loss_utils')
    from pdm_ssd_tpu.ops import losses

    B, N, D = 2, 40, 7
    pred = rng.randn(B, N, D).astype(np.float32)
    target = rng.randn(B, N, D).astype(np.float32)
    weights = rng.rand(B, N).astype(np.float32)
    code_w = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]

    ref = lu.WeightedSmoothL1Loss(beta=1.0 / 9.0, code_weights=code_w)(
        _t(pred), _t(target), _t(weights)).numpy()
    mine = np.asarray(losses.weighted_smooth_l1(
        pred, target, weights, beta=1.0 / 9.0, code_weights=code_w))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


# --------------------------------------------------- CenterHead targets

def test_center_head_target_parity(rng):
    ch = ref_oracle.load('pcdet.models.dense_heads.center_head')
    from pdm_ssd_tpu.ops import centernet
    import types

    pc_range = np.array([0., -40., -3., 70.4, 40., 1.], np.float32)
    voxel_size = [0.4, 0.4, 1.0]
    W, H = 176, 200
    M = 12
    gt = np.zeros((M, 8), np.float32)
    gt[:, 0] = rng.uniform(0, 70, M)
    gt[:, 1] = rng.uniform(-40, 40, M)
    gt[:, 2] = rng.uniform(-2, 0.5, M)
    gt[:, 3:6] = rng.uniform(0.5, 4.5, (M, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, M)
    gt[:, 7] = rng.randint(1, 4, M)
    n_valid = 9
    valid = np.arange(M) < n_valid

    fake_self = types.SimpleNamespace(
        point_cloud_range=torch.from_numpy(pc_range),
        voxel_size=voxel_size)
    hm_ref, boxes_ref, inds_ref, mask_ref, _src = \
        ch.CenterHead.assign_target_of_single_head(
            fake_self, 3, _t(gt[:n_valid]), feature_map_size=[W, H],
            feature_map_stride=1, num_max_objs=M, gaussian_overlap=0.1,
            min_radius=2)

    hm, boxes, inds, mask, _src = centernet.assign_center_targets(
        gt, valid, num_classes=3, feature_map_size=(W, H),
        feature_map_stride=1, voxel_size=voxel_size, point_cloud_range=pc_range,
        num_max_objs=M, gaussian_overlap=0.1, min_radius=2)

    np.testing.assert_array_equal(np.asarray(inds), inds_ref.numpy())
    np.testing.assert_array_equal(np.asarray(mask), mask_ref.numpy())
    np.testing.assert_allclose(np.asarray(boxes), boxes_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(hm), hm_ref.numpy(), atol=1e-4)


# ------------------------------------------- axis-aligned anchor assignment

def test_axis_aligned_assigner_parity(rng):
    aa = ref_oracle.load(
        'pcdet.models.dense_heads.target_assigner.axis_aligned_target_assigner')
    bc = ref_oracle.load('pcdet.utils.box_coder_utils')
    from pdm_ssd_tpu.models.dense_heads.anchor_head import AnchorHeadSingle
    from pdm_ssd_tpu.utils.config import as_cfg

    grid = (16, 16)
    pc_range = [0., -8., -3., 16., 8., 1.]
    anchor_cfg = [
        {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
         'align_center': False, 'feature_map_stride': 1,
         'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
        {'class_name': 'Pedestrian', 'anchor_sizes': [[0.8, 0.6, 1.73]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
         'align_center': False, 'feature_map_stride': 1,
         'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
    ]
    model_cfg = {
        'ANCHOR_GENERATOR_CONFIG': anchor_cfg,
        'TARGET_ASSIGNER_CONFIG': {
            'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
            'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
            'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder'},
        'USE_DIRECTION_CLASSIFIER': False,
    }
    head = AnchorHeadSingle(
        model_cfg=as_cfg(model_cfg), input_channels=64, num_class=2,
        class_names=['Car', 'Pedestrian'], grid_size=grid,
        point_cloud_range=pc_range)
    my_anchors, slices = head._anchors()
    A = my_anchors.shape[0]

    B, M = 2, 5
    gt = np.zeros((B, M, 8), np.float32)
    gt[..., 0] = rng.uniform(1, 15, (B, M))
    gt[..., 1] = rng.uniform(-7, 7, (B, M))
    gt[..., 2] = rng.uniform(-1.8, -0.5, (B, M))
    gt[..., 3:6] = np.array([3.7, 1.6, 1.5]) * rng.uniform(0.8, 1.2, (B, M, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, M))
    gt[..., 7] = rng.randint(1, 3, (B, M))
    gt_mask = np.ones((B, M), bool)
    gt_mask[1, 3:] = False
    gt_masked = gt.copy()
    gt_masked[~gt_mask] = 0.0

    # reference assigner consumes my anchor geometry per class, so orderings
    # line up one-to-one
    from easydict import EasyDict
    ref_assigner = aa.AxisAlignedTargetAssigner(
        EasyDict(model_cfg), box_coder=bc.ResidualCoder(code_size=7),
        class_names=['Car', 'Pedestrian'], match_height=False)
    # my flat per-class anchors are ordered [y][x][size=1][rot]; the reference
    # assigner wants (nz=1, ny, nx, n_size, n_rot, 7) and flattens identically
    W, H = grid
    ref_anchor_list = [
        _t(np.asarray(my_anchors[s0:s1])).view(1, H, W, 1, 2, 7)
        for s0, s1 in slices]
    ref_out = ref_assigner.assign_targets(ref_anchor_list, _t(gt_masked))

    targets = head.assign_targets(
        {'gt_boxes': gt_masked, 'gt_mask': gt_mask})
    labels_mine = np.asarray(targets['anchor_cls_labels'])

    def ref_to_class_major(t, trailing=()):
        # reference flattens [y][x][class][rot]; mine is [class][y][x][rot]
        t = t.reshape((B, H, W, 2, 2) + trailing)
        return np.moveaxis(t, 3, 1).reshape((B, -1) + trailing)

    labels_ref = ref_to_class_major(ref_out['box_cls_labels'].numpy())
    assert labels_mine.shape == labels_ref.shape == (B, A)
    agree = (labels_mine == labels_ref).mean()
    assert agree > 0.999, f'label agreement {agree}'

    # box targets on the anchors both sides call positive
    pos = (labels_mine > 0) & (labels_ref > 0)
    bt_mine = np.asarray(targets['anchor_box_targets'])[pos]
    bt_ref = ref_to_class_major(ref_out['box_reg_targets'].numpy(), (7,))[pos]
    np.testing.assert_allclose(bt_mine, bt_ref, atol=1e-3)


# ---------------------------------------------------------- KITTI AP driver

def _random_kitti_annos(rng, n_frames=8):
    """GT + jittered detections in KITTI camera format with difficulty
    spread, DontCare rows and false positives."""
    classes = ['Car', 'Pedestrian', 'Cyclist', 'Van', 'DontCare']
    gts, dts = [], []
    for _ in range(n_frames):
        n = rng.randint(2, 9)
        name = np.array([classes[rng.randint(0, 5)] for _ in range(n)])
        y1 = rng.uniform(120, 200, n)
        h_px = rng.uniform(15, 90, n)
        x1 = rng.uniform(0, 1100, n)
        bbox = np.stack([x1, y1, x1 + h_px * rng.uniform(0.8, 2.5, n),
                         y1 + h_px], axis=1)
        gt = {
            'name': name,
            'truncated': rng.uniform(0, 0.6, n),
            'occluded': rng.randint(0, 4, n).astype(np.float64),
            'alpha': rng.uniform(-np.pi, np.pi, n),
            'bbox': bbox,
            'dimensions': np.stack([rng.uniform(3, 4.5, n),
                                    rng.uniform(1.4, 1.8, n),
                                    rng.uniform(1.5, 1.9, n)], axis=1),
            'location': np.stack([rng.uniform(-15, 15, n),
                                  rng.uniform(1.4, 1.8, n),
                                  rng.uniform(5, 60, n)], axis=1),
            'rotation_y': rng.uniform(-np.pi, np.pi, n),
            'score': -np.ones(n),
        }
        gts.append(gt)

        keep = rng.rand(n) > 0.2
        n_fp = rng.randint(0, 3)
        det_src = {k: np.concatenate([np.asarray(v)[keep]] + (
            [np.asarray(v)[rng.randint(0, n, n_fp)]] if n_fp else []))
            for k, v in gt.items()}
        m = len(det_src['name'])
        det_src['name'] = np.where(det_src['name'] == 'DontCare', 'Car',
                                   det_src['name'])
        det_src['bbox'] = det_src['bbox'] + rng.uniform(-6, 6, (m, 4))
        det_src['location'] = det_src['location'] + rng.uniform(-0.4, 0.4, (m, 3))
        det_src['score'] = rng.rand(m)
        dts.append(det_src)
    return gts, dts


def test_kitti_eval_protocol_parity(rng):
    """Full AP pipeline vs the reference evaluator. Both sides are pointed at
    the SAME rotated-overlap backend, so matcher logic, threshold tables,
    difficulty filtering, and R11/R40 AP sampling are what's compared."""
    ev = ref_oracle.load('pcdet.datasets.kitti.kitti_object_eval_python.eval')
    from pdm_ssd_tpu.utils import np_iou
    from pdm_ssd_tpu.datasets.kitti import eval as my_eval

    def np_rotate_iou(boxes, qboxes, criterion=-1):
        inter = np_iou.rect_overlap_cpu(boxes.astype(np.float32),
                                        qboxes.astype(np.float32))
        if criterion == -1:
            a = (boxes[:, 2] * boxes[:, 3])[:, None]
            b = (qboxes[:, 2] * qboxes[:, 3])[None, :]
            return (inter / np.clip(a + b - inter, 1e-8, None)).astype(np.float32)
        return inter.astype(np.float32)   # criterion 2: raw intersection

    ev.rotate_iou_gpu_eval = np_rotate_iou

    gts, dts = _random_kitti_annos(rng)
    ref_str, ref_dict = ev.get_official_eval_result(
        gts, dts, ['Car', 'Pedestrian', 'Cyclist'])
    my_str, my_dict = my_eval.get_official_eval_result(
        gts, dts, ['Car', 'Pedestrian', 'Cyclist'])

    shared = sorted(set(ref_dict) & set(my_dict))
    assert len(shared) >= 36, f'only {len(shared)} shared metric keys'
    for k in shared:
        assert abs(float(ref_dict[k]) - float(my_dict[k])) < 0.15, \
            f'{k}: ref {ref_dict[k]} vs mine {my_dict[k]}'
