"""Focal sparse conv: host dilation maps + the in-graph fore/back split
against a brute-force simulation of the reference's dynamic algorithm
(`pcdet/models/backbones_3d/focal_sparse_conv/focal_sparse_utils.py:89-147`
`split_voxels`/`check_repeat` + `focal_sparse_conv.py:171-215`
`combine_out`), plus a full SECOND-focal assembly smoke (fwd/loss/grad).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.ops import sparse_maps as sm
from pdm_ssd_tpu.models.backbones_3d.sparse_backbone_focal import focal_split


def random_actives(rng, dims, n):
    D, H, W = dims
    flat = rng.choice(D * H * W, size=min(n, D * H * W), replace=False)
    flat.sort()
    c = np.stack([flat // (H * W), (flat // W) % H, flat % W], -1)
    return c.astype(np.int32)


def test_dilate_table_brute_force(rng):
    dims = (5, 6, 7)
    n = 25
    c = random_actives(rng, dims, n)
    cap = 32
    coords = np.zeros((cap, 3), np.int32)
    coords[:n] = c
    cap_e = 500
    ec, ne, eorig, espawn = sm._dilate_table(coords, n, dims, cap_e)
    offs = sm.focal_kernel_offsets()
    # expected E = actives UNION in-bounds 26-neighbors
    want = set(map(tuple, c))
    for v in c:
        for o in offs:
            q = v + o
            if (q >= 0).all() and (q < dims).all():
                want.add(tuple(q))
    got = set(map(tuple, ec[:ne]))
    assert got == want
    lut = {tuple(v): i for i, v in enumerate(c)}
    for i in range(ne):
        # eorig: slot of the E coord in the base table
        assert eorig[i] == lut.get(tuple(ec[i]), cap)
        for j, o in enumerate(offs):
            src = tuple(ec[i] - o)
            ok = all(0 <= s < d for s, d in zip(src, dims)) \
                and (ec[i] > 0).all()          # reference strict > 0 bound
            want_slot = lut.get(src, cap) if ok else cap
            assert espawn[i, j] == want_slot, (i, j)
    assert (espawn[ne:] == cap).all()


def simulate_reference_split(c, feats, imps, dims, topk, thr, mask_multi,
                             skip_mask_kernel):
    """Dynamic-set simulation of split_voxels + check_repeat + combine_out
    for one sample (numpy dicts; the reference's torch code restated)."""
    offs = sm.focal_kernel_offsets()
    n = len(c)
    sig = 1.0 / (1.0 + np.exp(-imps))
    mv = sig[:, 26]
    if topk:
        order = np.argsort(-mv, kind='stable')
        fg_idx = set(order[:int(np.floor(thr * n))].tolist())
    else:
        fg_idx = set(np.nonzero(mv > thr)[0].tolist())
    f = feats.copy()
    if mask_multi:
        f = f * mv[:, None]
    fore = {}   # coord -> [feat_sum, mask_sum, cnt]
    for i in range(n):
        if i not in fg_idx:
            continue
        key = tuple(c[i])
        e = fore.setdefault(key, [np.zeros(f.shape[1]), 0.0, 0])
        e[0] = e[0] + f[i]
        e[1] += 1.0
        e[2] += 1
        for j, o in enumerate(offs):
            if sig[i, j] < thr:
                continue
            q = c[i] + o
            if not ((q > 0).all() and (q < dims).all()):
                continue   # reference strict > 0 bound, split_voxels:130
            e2 = fore.setdefault(tuple(q), [np.zeros(f.shape[1]), 0.0, 0])
            e2[1] += float(sig[i, j])
            e2[2] += 1
    out = {}
    for key, (fs, ms, cnt) in fore.items():
        scale = 1.0 if skip_mask_kernel else ms / cnt
        out[key] = fs * scale
    for i in range(n):
        if i in fg_idx:
            continue
        key = tuple(c[i])
        out[key] = out.get(key, np.zeros(f.shape[1])) + f[i]
    return out


@pytest.mark.parametrize('topk,mask_multi,skip', [
    (True, False, False), (False, False, False),
    (True, True, False), (True, False, True)])
def test_focal_split_matches_reference_sim(rng, topk, mask_multi, skip):
    dims = (6, 7, 8)
    n, cap, cap_e, C = 30, 36, 600, 5
    c = random_actives(rng, dims, n)
    coords = np.zeros((cap, 3), np.int32)
    coords[:n] = c
    ec, ne, eorig, espawn = sm._dilate_table(coords, n, dims, cap_e)
    feats = rng.normal(size=(cap, C)).astype(np.float32)
    feats[n:] = 0
    imps = rng.normal(size=(cap, 27)).astype(np.float32) * 2.0
    act = np.arange(cap) < n
    emask = np.arange(cap_e) < ne

    fe, bits = focal_split(
        jnp.asarray(feats)[None], jnp.asarray(act)[None],
        jnp.asarray(imps)[None], jnp.asarray(eorig)[None],
        jnp.asarray(espawn)[None], jnp.asarray(emask)[None],
        topk=topk, threshold=0.5, mask_multi=mask_multi,
        skip_mask_kernel=skip)
    fe, bits = np.asarray(fe[0]), np.asarray(bits[0])

    want = simulate_reference_split(c, feats[:n], imps[:n], dims, topk,
                                    0.5, mask_multi, skip)
    got_active = {tuple(ec[i]) for i in range(cap_e) if bits[i]}
    assert got_active == set(want.keys())
    for i in range(cap_e):
        key = tuple(ec[i])
        if bits[i]:
            np.testing.assert_allclose(fe[i], want[key], rtol=1e-5,
                                       atol=1e-5)
        else:
            assert not fe[i].any()


def test_focal_ladder_maps_build(rng):
    grid = (32, 32, 8)          # (W, H, D)
    caps = [64, 128, 96, 64, 64]
    ecaps = [256, 384, 256]
    dims = sm.ladder_shapes(grid)[0]
    c = random_actives(rng, dims, 50)
    coords = np.zeros((64, 3), np.int32)
    coords[:50] = c
    maps = sm.build_focal_ladder_maps(coords, 50, grid, caps, ecaps)
    assert set(maps.keys()) == set(sm.FOCAL_KEYS)
    for s, capc, cape in zip((1, 2, 3), caps[:3], ecaps):
        assert maps[f'fl_submap{s}'].shape[1] == 27
        assert maps[f'fl_espawn{s}'].shape == (cape, 26)
        # every original site appears in its dilated table
        nm = int(maps[f'fl_cmask{s}'].sum())
        eo = maps[f'fl_eorig{s}']
        hits = np.sort(eo[eo < capc])
        assert np.array_equal(hits, np.arange(nm))


def test_second_focal_assembly(rng):
    """SECOND + VoxelBackBone8xFocal fwd/loss/grad/predict on a tiny grid,
    via the real config + host-prepare path."""
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from tests.test_sparse_backbone import second_sparse_cfg, ds_cfg_fine
    from tests.test_sparse_backbone import test_second_sparse_assembly  # noqa: F401
    cfg = second_sparse_cfg()
    cfg['BACKBONE_3D'] = {'NAME': 'VoxelBackBone8xFocal',
                          'NUM_FILTERS': [4, 8, 8, 8], 'OUT_FEATURES': 8,
                          'ACTIVE_CAPS': [256, 512, 384, 256, 256],
                          'FOCAL_ECAPS': [1024, 2048, 1536],
                          'TOPK': True, 'THRESHOLD': 0.5}
    ds = ds_cfg_fine()
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    from tests.test_detector3d_zoo import make_batch
    batch = make_batch(rng)
    B, V = 2, 256
    dims = sm.ladder_shapes((64, 64, 24))[0]
    coords = np.stack([random_actives(rng, dims, 120) for _ in range(B)])
    cpad = np.zeros((B, V, 3), np.int32)
    cpad[:, :120] = coords
    vmask = np.zeros((B, V), bool)
    vmask[:, :120] = True
    batch.update({
        'voxels': jnp.asarray(rng.normal(size=(B, V, 5, 4)).astype(np.float32)),
        'voxel_coords': jnp.asarray(cpad),
        'voxel_num_points': jnp.asarray(np.full((B, V), 5, np.int32)),
        'voxel_mask': jnp.asarray(vmask)})
    prepare = get_host_prepare(cfg, ds)
    assert prepare is not None
    batch = prepare({k: np.asarray(v) for k, v in batch.items()})
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(tb['loss_box_of_pts']))
    g = jax.grad(lambda p: model.apply(
        {'params': p, 'batch_stats': variables['batch_stats']}, batch,
        training=True, mutable=['batch_stats'],
        method=model.forward_with_loss)[0][0])(variables['params'])
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    gnorm = sum(float(jnp.sum(jnp.abs(v))) for _, v in flat)
    assert np.isfinite(gnorm) and gnorm > 0
    imp_g = [float(jnp.sum(jnp.abs(v))) for k, v in flat
             if 'conv_imp' in jax.tree_util.keystr(k)]
    assert imp_g and sum(imp_g) > 0
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[0] == B


def test_second_focal_ship_config_builds():
    from pdm_ssd_tpu.utils.config import cfg_from_yaml_file
    from pdm_ssd_tpu.models import build_network
    cfg = cfg_from_yaml_file('configs/kitti_models/second_focal.yaml')
    net = build_network(cfg.MODEL, num_class=3,
                        dataset_cfg=cfg.DATA_CONFIG,
                        class_names=cfg.CLASS_NAMES)
    assert net is not None


def test_focal_gather_bwd_matches_autodiff(rng):
    """The focal ladder's submanifold convs use the self-transpose
    gather backward (`sparse_conv_mm`); gradients must match XLA autodiff
    (GATHER_BWD on/off) through the dynamic activation-bit masks."""
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from tests.test_sparse_backbone import second_sparse_cfg, ds_cfg_fine
    from tests.test_detector3d_zoo import make_batch
    cfg = second_sparse_cfg()
    cfg['BACKBONE_3D'] = {'NAME': 'VoxelBackBone8xFocal',
                          'NUM_FILTERS': [4, 8, 8, 8], 'OUT_FEATURES': 8,
                          'ACTIVE_CAPS': [256, 512, 384, 256, 256],
                          'FOCAL_ECAPS': [1024, 2048, 1536],
                          'TOPK': True, 'THRESHOLD': 0.5}
    ds = ds_cfg_fine()
    batch = make_batch(rng)
    B, V = 2, 256
    dims = sm.ladder_shapes((64, 64, 24))[0]
    coords = np.stack([random_actives(rng, dims, 120) for _ in range(B)])
    cpad = np.zeros((B, V, 3), np.int32)
    cpad[:, :120] = coords
    vmask = np.zeros((B, V), bool)
    vmask[:, :120] = True
    batch.update({
        'voxels': rng.normal(size=(B, V, 5, 4)).astype(np.float32),
        'voxel_coords': cpad,
        'voxel_num_points': np.full((B, V), 5, np.int32),
        'voxel_mask': vmask})
    batch = get_host_prepare(cfg, ds)(
        {k: np.asarray(v) for k, v in batch.items()})
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    grads = {}
    for gb in (True, False):
        cfg['BACKBONE_3D']['GATHER_BWD'] = gb
        model = build_network(cfg, num_class=3, dataset_cfg=ds,
                              class_names=['Car', 'Pedestrian', 'Cyclist'])
        variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                               training=False)
        grads[gb] = jax.grad(lambda p: model.apply(
            {'params': p, 'batch_stats': variables['batch_stats']}, batch,
            training=True, mutable=['batch_stats'],
            method=model.forward_with_loss)[0][0])(variables['params'])
    fa = dict((jax.tree_util.keystr(p), v) for p, v in
              jax.tree_util.tree_flatten_with_path(grads[False])[0])
    for path, v in jax.tree_util.tree_flatten_with_path(grads[True])[0]:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(fa[jax.tree_util.keystr(path)]),
            rtol=2e-4, atol=2e-5, err_msg=jax.tree_util.keystr(path))
