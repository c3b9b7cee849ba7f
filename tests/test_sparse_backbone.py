"""Sparse voxel backbone: host kernel-map builder + gather-matmul conv parity
against brute-force / dense-conv oracles, plus a full SECOND assembly smoke.

Parity logic: a submanifold conv over a zero-filled dense volume equals the
dense 3D conv sampled at the active sites; a strided sparse conv equals the
dense strided conv sampled at its (dilated) active output sites, and the
dense output is zero everywhere else. These tests pin the map builder
(`ops/sparse_maps.py`) and the device conv (`models/backbones_3d/
sparse_backbone.py`) to those identities. Reference semantics:
`pcdet/models/backbones_3d/spconv_backbone.py:70-180`.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.ops import sparse_maps as sm
from pdm_ssd_tpu.models.backbones_3d.sparse_backbone import (
    SparseConvBNReLU, gather_taps)


def random_actives(rng, dims, n):
    """n unique active cells in a (D, H, W) grid, coords zyx sorted by flat."""
    D, H, W = dims
    flat = rng.choice(D * H * W, size=min(n, D * H * W), replace=False)
    flat.sort()
    c = np.stack([flat // (H * W), (flat // W) % H, flat % W], -1)
    return c.astype(np.int32)


def test_subm_map_brute_force(rng):
    dims = (5, 7, 6)
    c = random_actives(rng, dims, 40)
    cap = 48
    coords = np.zeros((cap, 3), np.int32)
    coords[:40] = c
    nbr = sm._subm_map(coords, 40, dims, (3, 3, 3))
    assert nbr.shape == (cap, 27)
    lut = {tuple(v): i for i, v in enumerate(c)}
    k = 0
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                for i in range(40):
                    q = (c[i, 0] + dz, c[i, 1] + dy, c[i, 2] + dx)
                    want = lut.get(q, cap)
                    assert nbr[i, k] == want, (i, k, q)
                k += 1
    assert (nbr[40:] == cap).all()


def brute_down_sites(c, dims, ksize, stride, pad):
    dims_out = tuple((d + 2 * p - k) // s + 1
                     for d, k, s, p in zip(dims, ksize, stride, pad))
    act = set(map(tuple, c))
    out = set()
    for oz in range(dims_out[0]):
        for oy in range(dims_out[1]):
            for ox in range(dims_out[2]):
                o = (oz, oy, ox)
                hit = False
                for kz in range(ksize[0]):
                    for ky in range(ksize[1]):
                        for kx in range(ksize[2]):
                            i = (oz * stride[0] - pad[0] + kz,
                                 oy * stride[1] - pad[1] + ky,
                                 ox * stride[2] - pad[2] + kx)
                            if i in act:
                                hit = True
                if hit:
                    out.add(o)
    return out, dims_out


@pytest.mark.parametrize('spec', [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
])
def test_down_sites_brute_force(rng, spec):
    ksize, stride, pad = spec
    dims = (7, 9, 8)
    c = random_actives(rng, dims, 50)
    cap_in, cap_out = 64, 256
    coords = np.zeros((cap_in, 3), np.int32)
    coords[:50] = c
    co, n_out, dims_out = sm._down_sites(coords, 50, dims, ksize, stride,
                                         pad, cap_out)
    want, dims_want = brute_down_sites(c, dims, ksize, stride, pad)
    assert dims_out == dims_want
    got = set(map(tuple, co[:n_out]))
    assert got == want
    # maps: each tap of each output reads the correct input slot
    dmap = sm._down_map(coords, 50, dims, co, n_out, ksize, stride, pad)
    lut = {tuple(v): i for i, v in enumerate(c)}
    taps = [(kz, ky, kx) for kz in range(ksize[0])
            for ky in range(ksize[1]) for kx in range(ksize[2])]
    for oi in range(n_out):
        for ti, (kz, ky, kx) in enumerate(taps):
            q = (co[oi, 0] * stride[0] - pad[0] + kz,
                 co[oi, 1] * stride[1] - pad[1] + ky,
                 co[oi, 2] * stride[2] - pad[2] + kx)
            want_slot = lut.get(q, cap_in) \
                if all(0 <= q[a] < dims[a] for a in range(3)) else cap_in
            assert dmap[oi, ti] == want_slot


def _dense_conv(vol, w, stride, pad):
    """NDHWC dense conv oracle; w is (kz, ky, kx, Cin, Cout)."""
    return jax.lax.conv_general_dilated(
        vol[None], w, window_strides=stride,
        padding=[(p, p) for p in pad],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))[0]


def test_subm_conv_matches_dense(rng):
    dims = (5, 8, 9)
    n, cap, Cin, Cout = 37, 48, 6, 10
    c = random_actives(rng, dims, n)
    coords = np.zeros((cap, 3), np.int32)
    coords[:n] = c
    nbr = sm._subm_map(coords, n, dims, (3, 3, 3))
    feats = rng.randn(cap, Cin).astype(np.float32)
    feats[n:] = 0
    w = rng.randn(27 * Cin, Cout).astype(np.float32)

    g = gather_taps(jnp.asarray(feats)[None], jnp.asarray(nbr)[None])[0]
    sparse_out = np.asarray(g) @ w

    vol = np.zeros(dims + (Cin,), np.float32)
    vol[c[:, 0], c[:, 1], c[:, 2]] = feats[:n]
    wd = w.reshape(3, 3, 3, Cin, Cout)
    dense = np.asarray(_dense_conv(jnp.asarray(vol), jnp.asarray(wd),
                                   (1, 1, 1), (1, 1, 1)))
    np.testing.assert_allclose(sparse_out[:n],
                               dense[c[:, 0], c[:, 1], c[:, 2]],
                               rtol=1e-4, atol=1e-4)


def test_strided_conv_matches_dense(rng):
    dims = (6, 10, 12)
    n, cap_in, cap_out, Cin, Cout = 43, 64, 256, 5, 7
    ksize, stride, pad = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    c = random_actives(rng, dims, n)
    coords = np.zeros((cap_in, 3), np.int32)
    coords[:n] = c
    co, n_out, dims_out = sm._down_sites(coords, n, dims, ksize, stride,
                                         pad, cap_out)
    dmap = sm._down_map(coords, n, dims, co, n_out, ksize, stride, pad)
    feats = rng.randn(cap_in, Cin).astype(np.float32)
    feats[n:] = 0
    w = rng.randn(27 * Cin, Cout).astype(np.float32)

    g = gather_taps(jnp.asarray(feats)[None], jnp.asarray(dmap)[None])[0]
    sparse_out = np.asarray(g) @ w

    vol = np.zeros(dims + (Cin,), np.float32)
    vol[c[:, 0], c[:, 1], c[:, 2]] = feats[:n]
    dense = np.asarray(_dense_conv(jnp.asarray(vol),
                                   jnp.asarray(w.reshape(3, 3, 3, Cin, Cout)),
                                   stride, pad))
    assert dense.shape[:3] == dims_out
    np.testing.assert_allclose(sparse_out[:n_out],
                               dense[co[:n_out, 0], co[:n_out, 1],
                                     co[:n_out, 2]],
                               rtol=1e-4, atol=1e-4)
    # dense output vanishes off the active set
    m = np.zeros(dims_out, bool)
    m[co[:n_out, 0], co[:n_out, 1], co[:n_out, 2]] = True
    assert np.abs(dense[~m]).max() < 1e-5


def test_ladder_shapes_kitti_005():
    """The reference's 0.05 m KITTI regime: z 41 -> 21 -> 11 -> 5 -> 2
    (`spconv_backbone.py` inline comments)."""
    dims = sm.ladder_shapes((1408, 1600, 40))
    assert [d[0] for d in dims] == [41, 21, 11, 5, 2]
    assert dims[4][1:] == (200, 176)


def test_perm_restores_unsorted_coords(rng):
    dims = (5, 6, 7)
    c = random_actives(rng, dims, 30)
    shuf = rng.permutation(30)
    coords = np.zeros((40, 3), np.int32)
    coords[:30] = c[shuf]
    maps = sm.build_backbone8x_maps(coords, 30, (7, 6, 4), [40, 40, 32, 16, 16])
    np.testing.assert_array_equal(coords[maps['sp_perm1'][:30]],
                                  maps['sp_coords1'][:30])
    flat = sm._flat(maps['sp_coords1'][:30], sm.ladder_shapes((7, 6, 4))[0])
    assert (np.diff(flat) > 0).all()


def second_sparse_cfg():
    from tests.test_detector3d_zoo import pointpillar_cfg
    cfg = pointpillar_cfg()
    cfg['NAME'] = 'SECONDNet'
    del cfg['MAP_TO_BEV']
    cfg['VFE'] = {'NAME': 'MeanVFE'}
    cfg['BACKBONE_3D'] = {'NAME': 'SparseVoxelBackBone8x',
                          'NUM_FILTERS': [4, 8, 8, 8], 'OUT_FEATURES': 8}
    cfg['BACKBONE_2D'] = {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1],
                          'LAYER_STRIDES': [1], 'NUM_FILTERS': [16],
                          'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [16]}
    cfg['DENSE_HEAD']['TARGET_ASSIGNER_CONFIG']['FEATURE_MAP_STRIDE'] = 8
    return cfg


def ds_cfg_fine():
    from pdm_ssd_tpu.utils.config import CfgNode
    return CfgNode({
        'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
        'NUM_POINT_FEATURES': 4,
        'DATA_PROCESSOR': [
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.5, 0.5, 0.16666667],
             'MAX_POINTS_PER_VOXEL': 5,
             'MAX_NUMBER_OF_VOXELS': {'train': 256, 'test': 256}},
        ],
    })


@pytest.mark.parametrize('residual', [False, True])
def test_second_sparse_assembly(rng, residual):
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from tests.test_detector3d_zoo import make_batch
    cfg = second_sparse_cfg()
    if residual:
        cfg['BACKBONE_3D']['NAME'] = 'SparseVoxelResBackBone8x'
    ds = ds_cfg_fine()
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    # re-voxelize points at the fine grid so coords live on it
    B, V = 2, 256
    coords = np.zeros((B, V, 3), np.int32)
    feats_pts = np.zeros((B, V, 5, 4), np.float32)
    nump = np.zeros((B, V), np.int32)
    vmask = np.zeros((B, V), bool)
    for b in range(B):
        pts = np.asarray(batch['points'][b])
        cell = np.floor((pts[:, :3] - [0, -16, -3]) / [0.5, 0.5, 4 / 24]).astype(int)
        ok = np.all((cell >= 0) & (cell < [64, 64, 24]), 1)
        pts, cell = pts[ok], cell[ok]
        flat = (cell[:, 2] * 64 + cell[:, 1]) * 64 + cell[:, 0]
        order = np.argsort(flat, kind='stable')
        pts, cell, flat = pts[order], cell[order], flat[order]
        _, starts, counts = np.unique(flat, return_index=True,
                                      return_counts=True)
        nv = min(len(starts), V)
        for i in range(nv):
            k = min(counts[i], 5)
            feats_pts[b, i, :k] = pts[starts[i]:starts[i] + k]
            nump[b, i] = k
        coords[b, :nv] = cell[starts[:nv]][:, ::-1]
        vmask[b, :nv] = True
    batch.update({'voxels': jnp.asarray(feats_pts),
                  'voxel_coords': jnp.asarray(coords),
                  'voxel_num_points': jnp.asarray(nump),
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
    g = jax.grad(lambda p: model.apply(
        {'params': p, 'batch_stats': variables['batch_stats']}, batch,
        training=True, mutable=['batch_stats'],
        method=model.forward_with_loss)[0][0])(variables['params'])
    gnorm = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
    dets = model.apply(variables, batch, method=model.predict)
    assert dets['pred_boxes'].shape[0] == 2


def test_xwin_gather_matches_plain(rng):
    """The window-fetch gather (9 rows of 3C) must be exactly the plain
    27-row gather on maps from the real builder, including gaps and pads."""
    from pdm_ssd_tpu.models.backbones_3d.sparse_backbone import (
        gather_taps, gather_taps_xwin, xwin_plan)
    dims = (6, 12, 16)
    c = random_actives(rng, dims, 150)
    cap = 192
    coords = np.zeros((cap, 3), np.int32)
    coords[:150] = c
    nbr = sm._subm_map(coords, 150, dims, (3, 3, 3))
    feats = rng.randn(2, cap, 8).astype(np.float32)
    feats[:, 150:] = 0
    nbr_b = np.tile(nbr[None], (2, 1, 1))
    a = np.asarray(gather_taps(jnp.asarray(feats), jnp.asarray(nbr_b)))
    plan = xwin_plan(jnp.asarray(nbr_b), feats.shape[1])
    b = np.asarray(gather_taps_xwin(jnp.asarray(feats), plan))
    np.testing.assert_array_equal(a, b)
    # and on a strided down map
    co, n_out, _ = sm._down_sites(coords, 150, dims, (3, 3, 3), (2, 2, 2),
                                  (1, 1, 1), 256)
    dmap = sm._down_map(coords, 150, dims, co, n_out, (3, 3, 3), (2, 2, 2),
                        (1, 1, 1))
    dmap_b = np.tile(dmap[None], (2, 1, 1))
    a = np.asarray(gather_taps(jnp.asarray(feats), jnp.asarray(dmap_b)))
    plan = xwin_plan(jnp.asarray(dmap_b), feats.shape[1])
    b = np.asarray(gather_taps_xwin(jnp.asarray(feats), plan))
    np.testing.assert_array_equal(a, b)


def test_native_builder_matches_numpy(rng):
    """csrc/build_ladder_maps vs the numpy reference: exact equality of all
    LADDER_KEYS (skipped when no compiler)."""
    from pdm_ssd_tpu import csrc
    if csrc.lib() is None:
        pytest.skip('no native toolchain')
    dims_grid = (32, 24, 12)     # (W, H, D)
    D, H, W = 13, 24, 32
    flat = rng.choice(D * H * W, 800, replace=False)
    coords = np.stack([flat // (H * W), (flat // W) % H, flat % W],
                      -1).astype(np.int32)
    rng.shuffle(coords)
    caps = [800, 2000, 2000, 1200, 1200]
    ref = {}
    import pdm_ssd_tpu.csrc as c2
    orig = c2.build_ladder_maps
    try:
        c2.build_ladder_maps = lambda *a, **k: None
        ref = sm.build_backbone8x_maps(coords, 800, dims_grid, caps)
    finally:
        c2.build_ladder_maps = orig
    nat = sm.build_backbone8x_maps(coords, 800, dims_grid, caps)
    for k in sm.LADDER_KEYS:
        np.testing.assert_array_equal(np.asarray(ref[k], np.int64),
                                      np.asarray(nat[k], np.int64), err_msg=k)


def test_native_builder_clustered_truncating(rng):
    """Native vs numpy on a clustered cloud with grid-boundary hugging and
    caps tight enough to truncate stages 2-4 — stresses the merge-scan tap
    fill (early key exhaustion, border wrap guards) and the bitmap site
    scan's cap cutoff."""
    from pdm_ssd_tpu import csrc
    if csrc.lib() is None:
        pytest.skip('no native toolchain')
    dims_grid = (64, 48, 15)     # (W, H, D)
    D, H, W = 16, 48, 64
    pts = []
    for _ in range(12):          # tight clusters -> dense x runs
        cz, cy, cx = rng.randint(0, D), rng.randint(0, H), rng.randint(0, W)
        n = 120
        pts.append(np.stack([
            np.clip(cz + rng.randint(-2, 3, n), 0, D - 1),
            np.clip(cy + rng.randint(-4, 5, n), 0, H - 1),
            np.clip(cx + rng.randint(-6, 7, n), 0, W - 1)], -1))
    # explicit grid corners (border wrap guards)
    pts.append(np.array([[0, 0, 0], [D - 1, H - 1, W - 1], [0, H - 1, 0],
                         [D - 1, 0, W - 1]]))
    coords = np.concatenate(pts).astype(np.int32)
    flat = (coords[:, 0] * H + coords[:, 1]) * W + coords[:, 2]
    _, first = np.unique(flat, return_index=True)
    coords = coords[np.sort(first)]
    n = len(coords)
    caps = [n, n // 2, n // 2, n // 3, n // 3]   # forces truncation
    import pdm_ssd_tpu.csrc as c2
    orig = c2.build_ladder_maps
    try:
        c2.build_ladder_maps = lambda *a, **k: None
        ref = sm.build_backbone8x_maps(coords, n, dims_grid, caps)
    finally:
        c2.build_ladder_maps = orig
    nat = sm.build_backbone8x_maps(coords, n, dims_grid, caps)
    for k in sm.LADDER_KEYS:
        np.testing.assert_array_equal(np.asarray(ref[k], np.int64),
                                      np.asarray(nat[k], np.int64), err_msg=k)


def _win_variant(name):
    """(plan_fn, gather_fn, group, maxoff, zero_code) per packed-window
    variant."""
    from pdm_ssd_tpu.models.backbones_3d import sparse_backbone as sb
    return {
        'qwin': (sb.qwin_plan, sb.gather_taps_qwin, 4, 5, 6),
        'pwin': (sb.pwin_plan, sb.gather_taps_pwin, 2, 3, 4),
    }[name]


@pytest.mark.parametrize('variant', ['qwin', 'pwin'])
def test_packed_win_gather_matches_plain(rng, variant):
    """Packed-window gather (quad or pair): wherever pick < zero_code the
    result equals the plain gather; overflow taps read zero (restored
    later by corrections)."""
    plan_fn, gather_fn, _, _, zero_code = _win_variant(variant)
    dims = (6, 12, 16)
    c = random_actives(rng, dims, 150)
    cap = 192
    coords = np.zeros((cap, 3), np.int32)
    coords[:150] = c
    for nbr in (sm._subm_map(coords, 150, dims, (3, 3, 3)),
                sm._down_map(coords, 150, dims,
                             *sm._down_sites(coords, 150, dims, (3, 3, 3),
                                             (2, 2, 2), (1, 1, 1), 256)[:2],
                             (3, 3, 3), (2, 2, 2), (1, 1, 1))):
        feats = rng.randn(2, cap, 8).astype(np.float32)
        feats[:, 150:] = 0
        nbr_b = np.tile(nbr[None], (2, 1, 1))
        a = np.asarray(gather_taps(jnp.asarray(feats), jnp.asarray(nbr_b)))
        plan = plan_fn(jnp.asarray(nbr_b), cap)
        B, Vo = nbr_b.shape[:2]
        b = np.asarray(gather_fn(jnp.asarray(feats), plan))[:, :Vo]
        # overflow positions: zero in b, plain value in a
        r, pick = plan
        pk = np.asarray(pick)            # (B,Gg,group,9,3)
        pk = pk.reshape(B, -1, 27)[:, :Vo]
        C = 8
        af = a.reshape(B, Vo, 27, C)
        bf = b.reshape(B, Vo, 27, C)
        ovf = pk == zero_code
        np.testing.assert_array_equal(bf[ovf], np.zeros_like(bf[ovf]))
        np.testing.assert_array_equal(bf[~ovf], af[~ovf])


@pytest.mark.parametrize('variant', ['qwin', 'pwin'])
@pytest.mark.parametrize('density', ['dense', 'sparse'])
def test_packed_win_layer_with_corrections_matches_plain(rng, density,
                                                         variant):
    """Full layer equality: packed-window gather + correction list == plain
    gather, through the conv matmul, on subm and strided maps. The 'sparse'
    case (few actives in a large grid) forces heavy window overflow,
    exercising the correction path hard."""
    from pdm_ssd_tpu.models.backbones_3d.sparse_backbone import (
        SparseConvBNReLU)
    plan_fn, _, group, maxoff, _ = _win_variant(variant)
    if density == 'dense':
        dims, n, cap = (6, 12, 16), 150, 192
        c = random_actives(rng, dims, n)
    else:
        # ground-plane-like slab: dense x-rows crossing y — quads span row
        # boundaries whose neighbor taps land >5 slots away (overflow)
        dims, cap = (4, 24, 12), 160
        ok = rng.rand(24, 12) < 0.7
        ys, xs = np.nonzero(ok)
        c = np.stack([np.ones_like(ys), ys, xs], -1).astype(np.int32)
        n = min(len(c), cap)
        c = c[:n]
    coords = np.zeros((cap, 3), np.int32)
    coords[:n] = c
    co, n_out, _ = sm._down_sites(coords, n, dims, (3, 3, 3), (2, 2, 2),
                                  (1, 1, 1), 2 * cap)
    cases = [
        (sm._subm_map(coords, n, dims, (3, 3, 3)), cap, n, cap),
        (sm._down_map(coords, n, dims, co, n_out, (3, 3, 3), (2, 2, 2),
                      (1, 1, 1)), cap, n_out, 2 * cap),
    ]
    for nbr, cap_in, n_valid_out, cap_out in cases:
        feats = rng.randn(2, cap_in, 8).astype(np.float32)
        feats[:, n if cap_in == cap else n_out:] = 0
        nbr_b = np.tile(nbr[None], (2, 1, 1))
        mask = np.zeros((2, cap_out), bool)
        mask[:, :n_valid_out] = True
        # overflow stats: ensure the sparse case actually overflows
        o, t, i = sm.win_overflow_entries(nbr, cap_in, group, maxoff)
        if density == 'sparse' and variant == 'qwin':
            assert len(o) > 0
        capc = max(8, len(o) + 4)
        qcin, qcout, qctap = sm.qwin_corr_buckets(nbr, cap_in, capc,
                                                  group, maxoff)
        corr = tuple(jnp.asarray(np.tile(v[None], (2, 1)))
                     for v in (qcin, qcout, qctap))
        layer = SparseConvBNReLU(10, use_bn=False, use_relu=False)
        var = layer.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                         jnp.asarray(nbr_b), jnp.asarray(mask))
        ref = layer.apply(var, jnp.asarray(feats), jnp.asarray(nbr_b),
                          jnp.asarray(mask))
        plan = plan_fn(jnp.asarray(nbr_b), cap_in)
        got = layer.apply(var, jnp.asarray(feats), plan, jnp.asarray(mask),
                          False, corr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_qwin_corr_saturation_drops_exactly_tail(rng):
    """Bucket overflow beyond capc drops entries (cap-saturation
    convention) — the kept prefix still applies exactly."""
    from pdm_ssd_tpu.models.backbones_3d.sparse_backbone import (
        SparseConvBNReLU, qwin_plan)
    dims, cap = (4, 24, 12), 160
    ok = rng.rand(24, 12) < 0.7
    ys, xs = np.nonzero(ok)
    c = np.stack([np.ones_like(ys), ys, xs], -1).astype(np.int32)
    n = min(len(c), cap)
    coords = np.zeros((cap, 3), np.int32)
    coords[:n] = c[:n]
    nbr = sm._subm_map(coords, n, dims, (3, 3, 3))
    o, t, i = sm.qwin_overflow_entries(nbr, cap)
    assert len(o) > 2
    qcin, qcout, qctap = sm.qwin_corr_buckets(nbr, cap, 2)
    assert (qcin[:2] == i[:2]).all() and (qcout[:2] == o[:2]).all()


@pytest.mark.parametrize('variant', ['qwin', 'pwin'])
def test_packed_win_full_backbone_matches_plain(rng, variant):
    """SECOND assembly with QWIN/PWIN on vs off, same params: the packed-
    window gather + host correction lists must reproduce the plain path
    through the whole ladder (covers host_prepare's *_qcin/_qcout/_qctap
    keys)."""
    import jax
    import jax.numpy as jnp
    from pdm_ssd_tpu.models import build_network, get_host_prepare

    cfg = second_sparse_cfg()
    ds = ds_cfg_fine()
    from tests.test_sparse_two_stage import _fine_voxel_batch
    batch_np = {k: np.asarray(v)
                for k, v in _fine_voxel_batch(rng).items()}

    from pdm_ssd_tpu.utils.config import CfgNode
    flags = ({'QWIN': True, 'QWIN_CORR_CAP': 256} if variant == 'qwin'
             else {'PWIN': True, 'PWIN_CORR_CAP': 256})
    cfg_q = CfgNode({**cfg, 'BACKBONE_3D': dict(cfg['BACKBONE_3D'],
                                                **flags)})
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    model_q = build_network(cfg_q, num_class=3, dataset_cfg=ds,
                            class_names=['Car', 'Pedestrian', 'Cyclist'])
    prep = get_host_prepare(cfg, ds)
    prep_q = get_host_prepare(cfg_q, ds)
    b0 = {k: jnp.asarray(v) for k, v in prep(dict(batch_np)).items()}
    bq = {k: jnp.asarray(v) for k, v in prep_q(dict(batch_np)).items()}
    assert 'sp_submap1_qcin' in bq and 'sp_submap1_qcin' not in b0

    variables = model.init({'params': jax.random.PRNGKey(0)}, b0,
                           training=False)
    ref = model.apply(variables, b0, method=model.predict)
    got = model_q.apply(variables, bq, method=model_q.predict)
    np.testing.assert_allclose(np.asarray(got['pred_boxes']),
                               np.asarray(ref['pred_boxes']),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got['pred_scores']),
                               np.asarray(ref['pred_scores']),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('xwin', [False, True])
def test_gather_transpose_backward_matches_autodiff(rng, xwin):
    """`sparse_conv_mm`'s gather-transpose backward (one gather of dy
    through the tap-flipped / host-inverted map + two matmuls) must produce
    the same gradients as XLA autodiff of the plain gather+matmul
    formulation — for every param of the full SECOND assembly, including
    the strided down convs (sp_upmap*) and conv_out (sp_upmap_out)."""
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from tests.test_detector3d_zoo import make_batch
    cfg = second_sparse_cfg()
    cfg['BACKBONE_3D']['XWIN'] = xwin
    ds = ds_cfg_fine()
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    batch = make_batch(rng)
    B, V = 2, 256
    coords = np.zeros((B, V, 3), np.int32)
    feats_pts = np.zeros((B, V, 5, 4), np.float32)
    nump = np.zeros((B, V), np.int32)
    vmask = np.zeros((B, V), bool)
    for b in range(B):
        pts = np.asarray(batch['points'][b])
        cell = np.floor((pts[:, :3] - [0, -16, -3]) / [0.5, 0.5, 4 / 24]).astype(int)
        ok = np.all((cell >= 0) & (cell < [64, 64, 24]), 1)
        pts, cell = pts[ok], cell[ok]
        flat = (cell[:, 2] * 64 + cell[:, 1]) * 64 + cell[:, 0]
        order = np.argsort(flat, kind='stable')
        pts, cell, flat = pts[order], cell[order], flat[order]
        _, starts, counts = np.unique(flat, return_index=True,
                                      return_counts=True)
        nv = min(len(starts), V)
        for i in range(nv):
            k = min(counts[i], 5)
            feats_pts[b, i, :k] = pts[starts[i]:starts[i] + k]
            nump[b, i] = k
        coords[b, :nv] = cell[starts[:nv]][:, ::-1]
        vmask[b, :nv] = True
    batch.update({'voxels': feats_pts, 'voxel_coords': coords,
                  'voxel_num_points': nump, 'voxel_mask': vmask})
    prepare = get_host_prepare(cfg, ds, training=True)
    batch = prepare({k: np.asarray(v) for k, v in batch.items()})
    assert 'sp_upmap2' in batch and 'sp_upmap_out' in batch
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)

    def grads(b):
        return jax.grad(lambda p: model.apply(
            {'params': p, 'batch_stats': variables['batch_stats']}, b,
            training=True, mutable=['batch_stats'],
            method=model.forward_with_loss)[0][0])(variables['params'])

    g_gather = grads(batch)                      # upmaps present -> custom vjp
    b_plain = {k: v for k, v in batch.items() if not k.startswith('sp_upmap')}
    g_auto = grads(b_plain)                      # falls back to XLA autodiff
    flat_g, _ = jax.tree_util.tree_flatten_with_path(g_gather)
    flat_a = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(g_auto)[0])
    for path, v in flat_g:
        key = jax.tree_util.keystr(path)
        a = flat_a[key]
        np.testing.assert_allclose(np.asarray(v), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=key)


@pytest.mark.parametrize('n_threads', [1, 4])
def test_native_batch_builder_upmaps_match_numpy(rng, n_threads):
    """The batched C entry (`build_ladder_maps_batch`: one GIL-released
    call, std::thread pool over samples, in-C transpose-map inversion) vs
    the per-sample numpy reference + `batch_invert_ladder` — exact
    equality of all LADDER_KEYS + UPMAP_KEYS, at 1 and 4 worker threads."""
    from pdm_ssd_tpu import csrc
    if csrc.lib() is None or not hasattr(csrc.lib(), 'build_ladder_maps_batch'):
        pytest.skip('no native toolchain')
    dims_grid = (32, 24, 12)     # (W, H, D)
    D, H, W = 13, 24, 32
    B, V = 3, 800
    coords = np.zeros((B, V, 3), np.int32)
    vmask = np.zeros((B, V), bool)
    for b in range(B):
        n = [800, 517, 643][b]
        flat = rng.choice(D * H * W, n, replace=False)
        c = np.stack([flat // (H * W), (flat // W) % H, flat % W],
                     -1).astype(np.int32)
        rng.shuffle(c)
        coords[b, :n] = c
        vmask[b, :n] = True
    caps = [800, 2000, 2000, 1200, 1200]
    ref = {}
    per = [sm.build_backbone8x_maps(coords[b], int(vmask[b].sum()),
                                    dims_grid, caps)
           for b in range(B)]
    # force the numpy path for the reference
    import pdm_ssd_tpu.csrc as c2
    orig = c2.build_ladder_maps
    try:
        c2.build_ladder_maps = lambda *a, **k: None
        per = [sm.build_backbone8x_maps(coords[b], int(vmask[b].sum()),
                                        dims_grid, caps) for b in range(B)]
    finally:
        c2.build_ladder_maps = orig
    ref = {k: np.stack([p[k] for p in per]) for k in sm.LADDER_KEYS}
    ref.update(sm.batch_invert_ladder(ref, caps))
    nat = csrc.batch_build_ladder_maps(
        coords, vmask, np.asarray(sm.ladder_shapes(dims_grid)[0], np.int32),
        caps, want_upmaps=True, n_threads=n_threads)
    assert nat is not None
    for k in sm.LADDER_KEYS + sm.UPMAP_KEYS:
        np.testing.assert_array_equal(np.asarray(ref[k], np.int64),
                                      np.asarray(nat[k], np.int64), err_msg=k)


def test_int8_slot_tables_close_to_f32(rng):
    """TABLE_DTYPE int8 (dynamic per-channel symmetric quantization of the
    gather payloads, dequant folded into the matmul kernel): the full SECOND
    ladder's BEV features stay close to the f32 path — the bandwidth lever
    for the sparse-family inference headline."""
    import jax
    import jax.numpy as jnp
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from pdm_ssd_tpu.utils.config import CfgNode

    cfg = second_sparse_cfg()
    ds = ds_cfg_fine()
    from tests.test_sparse_two_stage import _fine_voxel_batch
    batch_np = {k: np.asarray(v) for k, v in _fine_voxel_batch(rng).items()}
    cfg_q = CfgNode({**cfg, 'BACKBONE_3D': dict(cfg['BACKBONE_3D'],
                                                TABLE_DTYPE='int8')})
    model = build_network(cfg, num_class=3, dataset_cfg=ds,
                          class_names=['Car', 'Pedestrian', 'Cyclist'])
    model_q = build_network(cfg_q, num_class=3, dataset_cfg=ds,
                            class_names=['Car', 'Pedestrian', 'Cyclist'])
    prep = get_host_prepare(cfg, ds)
    b0 = {k: jnp.asarray(v) for k, v in prep(dict(batch_np)).items()}
    variables = model.init({'params': jax.random.PRNGKey(0)}, b0,
                           training=False)
    import flax.linen as nn  # noqa: F401

    out = model.apply(variables, b0, training=False)
    out_q = model_q.apply(variables, b0, training=False)
    a = np.asarray(out['spatial_features'])
    b = np.asarray(out_q['spatial_features'])
    # int8 payloads through an 11-layer ladder: relative error stays small
    denom = np.abs(a).mean() + 1e-6
    rel = np.abs(a - b).mean() / denom
    assert rel < 0.12, rel
    assert np.isfinite(b).all()
    # and the quantized path is genuinely int8 in-graph: same params apply
    # (shape compatibility) was already exercised above
