"""MPPNet streaming (E2E) driven by its ACTUAL stage-1 (VERDICT r4 item 9):
a briefly trained tiny MPPNet streams a synthetic moving scene with proposal
churn — one persistent moving car, one that disappears mid-sequence, one
that appears — through `predict_with_state`. Replaces the hand-fed proposal
stream of `test_mppnet_depth.py` with real stage-1 NMS output each step, and
asserts trajectory matching follows the mover and the memory bank evicts the
vanished object within T-1 steps (reference
`mppnet_memory_bank_e2e.py:331-358,464-466`).
"""
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from test_detector3d_zoo import pvrcnn_cfg
from test_mppnet_depth import _head_cfg

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.models import build_network

T_BANK = 4       # head NUM_FRAMES -> bank holds T-1 = 3 past frames
T_SEQ = 9
A0 = np.array([12.0, 2.0, -1.0, 4.0, 2.0, 1.6, 0.0], np.float32)   # mover
A_VX = 3.0
C_BOX = np.array([24.0, -8.0, -1.0, 4.0, 2.0, 1.6, 0.5], np.float32)
B_BOX = np.array([8.0, 10.0, -1.0, 4.0, 2.0, 1.6, -0.3], np.float32)
C_LAST, B_FIRST = 4, 5      # C present t<=4; B present t>=5


def _a_pos(t):
    p = A0.copy()
    p[0] -= A_VX * 0.1 * t
    return p


def _frame_points(rng, t, n=424):
    boxes = [_a_pos(t)]
    if t <= C_LAST:
        boxes.append(C_BOX)
    if t >= B_FIRST:
        boxes.append(B_BOX)
    chunks = []
    per = 120
    for b in boxes:
        chunks.append(np.stack([
            b[0] + rng.uniform(-1.8, 1.8, per),
            b[1] + rng.uniform(-0.9, 0.9, per),
            b[2] + rng.uniform(-0.7, 0.7, per), rng.rand(per)], -1))
    # ground-plane clutter well below the objects: the scene stays
    # height-separable so the tiny stage-1 can actually learn it
    n_bg = n - per * len(boxes)
    chunks.append(np.stack([rng.uniform(0, 32, n_bg),
                            rng.uniform(-16, 16, n_bg),
                            rng.uniform(-3.0, -2.3, n_bg), rng.rand(n_bg)],
                           -1))
    return np.concatenate(chunks).astype(np.float32), np.stack(boxes)


def _ds_cfg():
    # 0.5 m voxels -> 64x64 grid -> 8x-downsampled anchor map every 4 m,
    # fine enough for the tracking assertions below
    return CfgNode({
        'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
        'NUM_POINT_FEATURES': 4,
        'DATA_PROCESSOR': [
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.5, 0.5, 4.0], 'MAX_POINTS_PER_VOXEL': 4,
             'MAX_NUMBER_OF_VOXELS': {'train': 512, 'test': 512}},
        ],
    })


def _voxelize(pts, V=512, P=4):
    """The pipeline's own voxelizer (0.5x0.5x4 m on [0,32]x[-16,16]x[-3,1]),
    padded to the static cap like collate does."""
    from pdm_ssd_tpu.datasets.processor.data_processor import DataProcessor
    proc = DataProcessor(
        [CfgNode({'NAME': 'transform_points_to_voxels',
                  'VOXEL_SIZE': [0.5, 0.5, 4.0], 'MAX_POINTS_PER_VOXEL': P,
                  'MAX_NUMBER_OF_VOXELS': {'train': V, 'test': V}})],
        point_cloud_range=[0, -16, -3, 32, 16, 1], training=False,
        num_point_features=4)
    dd = proc.forward({'points': pts.copy()})
    n = len(dd['voxels'])
    vox = np.zeros((1, V, P, 4), np.float32)
    coords = np.zeros((1, V, 3), np.int32)
    nump = np.zeros((1, V), np.int32)
    vox[0, :n] = dd['voxels'][:V]
    coords[0, :n] = dd['voxel_coords'][:V]
    nump[0, :n] = dd['voxel_num_points'][:V]
    return {'voxels': jnp.asarray(vox), 'voxel_coords': jnp.asarray(coords),
            'voxel_num_points': jnp.asarray(nump),
            'voxel_mask': jnp.asarray(nump > 0)}


def _batch_for(rng, t, with_gt=True):
    pts, boxes = _frame_points(rng, t)
    b = _voxelize(pts)
    b['points'] = jnp.asarray(pts[None])
    if with_gt:
        gt = np.zeros((1, 4, 8), np.float32)
        gt[0, :len(boxes), :7] = boxes
        gt[0, :len(boxes), 7] = 1
        b['gt_boxes'] = jnp.asarray(gt)
        b['gt_mask'] = jnp.asarray(np.arange(4)[None] < len(boxes))
    return b, boxes


@pytest.fixture(scope='module')
def trained_model():
    rng = np.random.RandomState(0)
    cfg = pvrcnn_cfg()
    cfg.NAME = 'MPPNet'
    del cfg['PFE']
    del cfg['POINT_HEAD']
    cfg.ROI_HEAD = _head_cfg(T=T_BANK)
    model = build_network(cfg, num_class=3, dataset_cfg=_ds_cfg(),
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch0, _ = _batch_for(rng, 0)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)}, batch0,
                           training=False)

    import optax
    tx = optax.adam(optax.linear_schedule(5e-3, 1e-3, 350))

    def loss_fn(p, bs, batch, key):
        (l, _), upd = model.apply({'params': p, 'batch_stats': bs}, batch,
                                  training=True, mutable=['batch_stats'],
                                  rngs={'targets': key},
                                  method=model.forward_with_loss)
        return l, upd['batch_stats']

    step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    params, bs = variables['params'], variables['batch_stats']
    opt = tx.init(params)
    # fresh point noise every step (same planted boxes) so stage-1 learns
    # the objects, not the exact clouds; frame mix covers both the
    # disappearing (t<=4) and the appearing (t>=5) object
    train_frames = [0, 1, 2, 6, 7]
    losses = []
    for i in range(350):
        batch = _batch_for(np.random.RandomState(1000 + i),
                           train_frames[i % len(train_frames)])[0]
        (l, bs), g = step(params, bs, batch, jax.random.PRNGKey(i))
        upd, opt = tx.update(g, opt)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, upd)
        losses.append(float(l))
    assert losses[-1] < losses[0], 'stage-1 failed to learn the scene'
    return model, {'params': params, 'batch_stats': bs}


def test_stream_tracks_matches_and_evicts(trained_model):
    model, variables = trained_model
    R = 8                       # NMS_POST_MAXSIZE of the tiny head cfg

    @jax.jit
    def step(batch, mem):
        return model.apply(variables, {**batch, 'mppnet_memory': mem},
                           method=model.predict_with_state)

    mem = model.init_memory(1, R)
    rng = np.random.RandomState(99)
    mems, dets, roi_hist = [mem], [], []
    for t in range(T_SEQ):
        b, _ = _batch_for(rng, t, with_gt=False)
        det, mem = step(b, mem)
        assert np.isfinite(np.asarray(det['pred_boxes'])).all()
        dets.append(jax.device_get(det))
        mems.append(jax.device_get(mem))
        roi_hist.append(np.asarray(mems[-1]['rois'][0, 0]))  # newest slot

    # 1) the bank's newest slot carries a (valid) roi near the mover at
    #    every step once stage-1 locks on
    a_hits = 0
    for t in range(T_SEQ):
        rois, valid = roi_hist[t], np.asarray(mems[t + 1]['valid'][0, 0])
        d = np.linalg.norm(rois[:, :2] - _a_pos(t)[None, :2], axis=-1)
        # the tiny stage-1's anchor grid is 4 m-spaced (8x map over 0.5 m
        # voxels), so proposals snap up to ~2 m from an object
        if (valid & (d < 2.5)).any():
            a_hits += 1
    assert a_hits >= T_SEQ - 3, f'mover tracked in only {a_hits}/{T_SEQ}'

    # 2) rolling: step t's newest slot becomes step t+1's slot 1
    np.testing.assert_allclose(np.asarray(mems[3]['rois'][0, 1]),
                               np.asarray(mems[2]['rois'][0, 0]), atol=0)
    np.testing.assert_allclose(np.asarray(mems[3]['valid'][0, 1]),
                               np.asarray(mems[2]['valid'][0, 0]), atol=0)

    # 3) eviction = a strict T-1 age horizon: every slot of the final bank
    #    is exactly the newest-slot snapshot of one of the last T-1 steps,
    #    so nothing recorded while C existed (age > T-1) survives. (A
    #    distance-to-C test would conflate bank mechanics with the overfit
    #    stage-1, which may keep proposing near C's old anchor; the horizon
    #    property is what the reference bank guarantees,
    #    `mppnet_memory_bank_e2e.py:464-466`.)
    final = mems[T_SEQ]
    for j in range(T_BANK - 1):
        np.testing.assert_allclose(np.asarray(final['rois'][0, j]),
                                   roi_hist[T_SEQ - 1 - j], atol=0)
        np.testing.assert_allclose(
            np.asarray(final['valid'][0, j]),
            np.asarray(mems[T_SEQ - j]['valid'][0, 0]), atol=0)

    # 4) churn: the appearing object B enters the bank after it shows up
    b_seen = any(
        (np.asarray(mems[t + 1]['valid'][0, 0])
         & (np.linalg.norm(roi_hist[t][:, :2] - B_BOX[None, :2], axis=-1)
            < 2.5)).any()
        for t in range(B_FIRST, T_SEQ))
    assert b_seen, 'appearing object never entered the bank'
