"""Fused windowed SA grouping (`ops/sa_fused.py`) vs the exact-semantics
reference ops (`ops/pointnet2.py`).

Covers VERDICT round-1 item 7: the bucket-cap approximation is *bounded
here* — parity is exact when no cell overflows and no ball exceeds K, and
neighbor recall is measured on a KITTI-like radially-concentrated cloud.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.ops import pointnet2 as ref
from pdm_ssd_tpu.ops import sa_fused

PC = (0.0, -40.0, 70.4, 40.0)


def _sorted_rows(x):
    """Lexicographically sort (K, D) rows for order-free comparison."""
    x = np.asarray(x)
    order = np.lexsort(x.T[::-1])
    return x[order]


def _uniform_cloud(key, B, N):
    lo = jnp.array([PC[0], PC[1], -3.0])
    hi = jnp.array([PC[2], PC[3], 1.0])
    return jax.random.uniform(key, (B, N, 3)) * (hi - lo) + lo


def test_exact_parity_sparse():
    """Sparse cloud: no cell overflow, balls underfull -> selected multisets
    must match the reference exactly (max-pool consumers see identical data)."""
    key = jax.random.PRNGKey(0)
    B, N, M, K, radius = 2, 512, 64, 16, 2.0
    xyz = _uniform_cloud(key, B, N)
    new_xyz = xyz[:, :M]

    idx_ref = ref.ball_query(radius, K, xyz, new_xyz)
    grouped_ref = ref.grouping_operation(xyz, idx_ref) - new_xyz[:, :, None, :]

    (rel, _f, hit), = sa_fused.fused_query_group(
        [radius], [K], xyz, None, new_xyz, PC, cap=64)

    d2 = jnp.sum((xyz[:, None, :, :] - new_xyz[:, :, None, :]) ** 2, -1)
    n_in = np.asarray(jnp.sum(d2 < radius ** 2, -1))
    for b in range(B):
        for m in range(M):
            if n_in[b, m] == 0:
                # reference gathers point 0 (garbage); we emit zeros
                assert np.allclose(np.asarray(rel)[b, m], 0.0)
                assert not np.asarray(hit)[b, m]
                continue
            # backfill multiplicity is order-dependent (both repeat *a* first
            # hit); max-pool consumers only see the unique set -> compare sets
            a = np.unique(np.round(np.asarray(grouped_ref)[b, m], 2), axis=0)
            c = np.unique(np.round(np.asarray(rel)[b, m], 2), axis=0)
            np.testing.assert_allclose(a, c, atol=2.5e-2)
            assert np.asarray(hit)[b, m]


def test_feature_extraction_matches_gather():
    """Grouped features must be the features of the selected points."""
    key = jax.random.PRNGKey(1)
    B, N, M, K, radius = 2, 1024, 32, 8, 3.0
    xyz = _uniform_cloud(key, B, N)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, N, 6))
    new_xyz = xyz[:, :M]

    (rel, gf, hit), = sa_fused.fused_query_group(
        [radius], [K], xyz, feats, new_xyz, PC, cap=64)

    # for every group row, the (rel+center, feat) pair must exist in the cloud
    pts = np.asarray(xyz)
    fts = np.asarray(feats)
    rel_n = np.asarray(rel)
    gf_n = np.asarray(gf)
    hit_n = np.asarray(hit)
    for b in range(B):
        for m in range(M):
            if not hit_n[b, m]:
                continue
            abs_xyz = rel_n[b, m] + np.asarray(new_xyz)[b, m]
            d = np.linalg.norm(pts[b][None] - abs_xyz[:, None], axis=-1)
            j = d.argmin(1)
            assert d[np.arange(K), j].max() < 2e-2
            np.testing.assert_allclose(gf_n[b, m], fts[b][j], atol=2e-2)
            # and all selected points are genuinely in-ball
            assert (np.linalg.norm(rel_n[b, m], axis=-1) < radius + 2e-2).all()


def test_backfill_repeats_first_hit():
    """Underfull balls repeat the first hit (reference semantics)."""
    xyz = jnp.array([[[10.0, 0.0, 0.0], [10.2, 0.0, 0.0], [50.0, 20.0, 0.0]]])
    new_xyz = jnp.array([[[10.1, 0.0, 0.0]]])
    (rel, _f, hit), = sa_fused.fused_query_group(
        [0.5], [8], xyz, None, new_xyz, PC, cap=8)
    rel = np.asarray(rel)[0, 0]
    assert np.asarray(hit)[0, 0]
    uniq = np.unique(np.round(rel, 4), axis=0)
    assert len(uniq) == 2  # two real neighbors
    # slots 2.. repeat slot 0's row
    np.testing.assert_allclose(rel[2:], np.broadcast_to(rel[0], rel[2:].shape),
                               atol=1e-6)


def _radial_kitti_cloud(key, B, N):
    """KITTI-like density: ranges ~ scaled Beta toward the sensor."""
    k1, k2, k3 = jax.random.split(key, 3)
    r = 5.0 + 65.0 * jax.random.beta(k1, 1.2, 3.0, (B, N))
    th = jax.random.uniform(k2, (B, N)) * 1.5 - 0.75  # +-43 deg
    z = jax.random.uniform(k3, (B, N)) * 3.0 - 2.5
    x = r * jnp.cos(th)
    y = r * jnp.sin(th)
    return jnp.stack([x, y, z], -1)


@pytest.mark.parametrize('radius,K,cap', [(0.8, 32, 32), (0.2, 16, 32)])
def test_neighbor_recall_under_cap(radius, K, cap):
    """Bound the bucket-cap drop on a near-field-heavy cloud: the selected
    neighbor count must reach >=90% of min(K, true in-ball count) on average."""
    key = jax.random.PRNGKey(3)
    B, N, M = 2, 16384, 512
    xyz = _radial_kitti_cloud(key, B, N)
    perm = jax.random.permutation(jax.random.PRNGKey(4), N)
    xyz = xyz[:, perm]  # shuffled order, as the pipeline guarantees
    new_xyz = xyz[:, :M]

    (rel, _f, hit), = sa_fused.fused_query_group(
        [radius], [K], xyz, None, new_xyz, PC, cap=cap)

    d2 = jnp.sum((xyz[:, None, :, :] - new_xyz[:, :, None, :]) ** 2, -1)
    true_cnt = np.asarray(jnp.minimum(jnp.sum(d2 < radius ** 2, -1), K))
    rel_n = np.asarray(rel)
    got_cnt = np.zeros((B, M))
    for b in range(B):
        for m in range(M):
            uniq = np.unique(np.round(rel_n[b, m], 4), axis=0)
            got_cnt[b, m] = len(uniq) if np.asarray(hit)[b, m] else 0
    mask = true_cnt > 0
    recall = (np.minimum(got_cnt, true_cnt)[mask] / true_cnt[mask]).mean()
    assert recall >= 0.90, f'neighbor recall {recall:.3f} under cap={cap}'


def test_two_branch_feat_slices():
    """Per-branch payload channel slicing (pretransformed-feature layout)."""
    key = jax.random.PRNGKey(5)
    B, N, M = 1, 256, 16
    xyz = _uniform_cloud(key, B, N)
    feats = jax.random.normal(jax.random.PRNGKey(6), (B, N, 10))
    new_xyz = xyz[:, :M]
    outs = sa_fused.fused_query_group(
        [1.0, 2.0], [4, 8], xyz, feats, new_xyz, PC, cap=32,
        feat_slices=[(0, 4), (4, 10)])
    (r1, f1, _), (r2, f2, _) = outs
    assert f1.shape == (B, M, 4, 4)
    assert f2.shape == (B, M, 8, 6)
    assert r1.shape == (B, M, 4, 3)
    assert r2.shape == (B, M, 8, 3)


def test_grad_flows_through_features():
    key = jax.random.PRNGKey(7)
    B, N, M = 1, 256, 8
    xyz = _uniform_cloud(key, B, N)
    feats = jax.random.normal(jax.random.PRNGKey(8), (B, N, 4))
    new_xyz = xyz[:, :M]

    def loss(f):
        (_r, gf, _h), = sa_fused.fused_query_group(
            [2.0], [8], xyz, f, new_xyz, PC, cap=32)
        return jnp.sum(gf ** 2)

    g = jax.grad(loss)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
