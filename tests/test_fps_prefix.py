"""FPS prefix-property elision (pointnet2_backbone 'prefix' sampling).

A farthest-first traversal has the prefix property: FPS applied to its own
output (in pick order, same seed-at-0 / first-argmax rules) is the identity
prefix. The backbone exploits this to skip the serial FPS chain at every SA
level after the first — these tests pin the exactness claim, including the
degenerate duplicate-padding tail (reference semantics:
`pcdet/ops/pointnet2/pointnet2_batch/src/sampling_gpu.cu:100` seeds at 0).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdm_ssd_tpu.ops import pointnet2 as p2


def _fps_np(x, m):
    return np.asarray(p2.farthest_point_sample(jnp.asarray(x), m))


class TestPrefixProperty:
    @pytest.mark.parametrize('n,m,k', [(512, 128, 128), (512, 128, 64),
                                       (1024, 256, 96), (64, 64, 32)])
    def test_fps_of_fps_output_is_arange(self, n, m, k):
        rng = np.random.RandomState(n + m + k)
        x = rng.randn(2, n, 3).astype(np.float32) * 10
        idx = _fps_np(x, m)
        s = np.take_along_axis(x, idx[..., None].astype(np.int64).repeat(3, -1), axis=1)
        idx2 = _fps_np(s, k)
        np.testing.assert_array_equal(idx2, np.broadcast_to(np.arange(k, dtype=np.int32), (2, k)))

    def test_chained_prefix(self):
        # prefix of a farthest-first order is itself farthest-first: level-3
        # over level-2's prefix output is again arange.
        rng = np.random.RandomState(0)
        x = rng.randn(1, 600, 3).astype(np.float32)
        s1 = np.take_along_axis(x, _fps_np(x, 200)[..., None].astype(np.int64).repeat(3, -1), 1)
        s2 = s1[:, :80]   # the 'prefix' module output at level 2
        np.testing.assert_array_equal(_fps_np(s2, 40), np.arange(40, dtype=np.int32)[None])

    def test_duplicate_padded_cloud_value_exact(self):
        # Fewer distinct points than the parent npoint: index parity may break
        # in the degenerate tail, but the SELECTED COORDINATES are identical —
        # the parent tail repeats pick 0, so prefix rows == true-FPS rows.
        rng = np.random.RandomState(7)
        distinct = rng.randn(1, 40, 3).astype(np.float32)
        reps = rng.randint(0, 40, size=(1, 216))
        x = np.concatenate([distinct, np.take_along_axis(
            distinct, reps[..., None].repeat(3, -1), 1)], axis=1)  # 256 pts, 40 distinct
        idx = _fps_np(x, 128)                      # degenerate past step 40
        s = np.take_along_axis(x, idx[..., None].astype(np.int64).repeat(3, -1), 1)
        true_idx = _fps_np(s, 64)
        true_rows = np.take_along_axis(s, true_idx[..., None].astype(np.int64).repeat(3, -1), 1)
        np.testing.assert_array_equal(true_rows, s[:, :64])


class TestBackbonePrefixElision:
    def _run(self, prefix_on):
        from pdm_ssd_tpu.models.backbones_3d.pointnet2_backbone import PointNet2MSG
        cfg = {
            'SA_CONFIG': {
                'NPOINTS': [64, 32, 16],
                'RADIUS': [[0.4, 0.8], [0.8, 1.6], [1.6, 3.2]],
                'NSAMPLE': [[8, 8], [8, 8], [8, 8]],
                'MLPS': [[[8, 8], [8, 8]], [[16, 16], [16, 16]], [[16, 16], [16, 16]]],
                'USE_XYZ': True,
                'FPS_PREFIX': prefix_on,
            },
            'FP_MLPS': [],
        }
        m = PointNet2MSG(model_cfg=cfg, input_channels=4,
                         pc_range=(-8., -8., -3., 8., 8., 1.))
        rng = np.random.RandomState(3)
        pts = jnp.asarray(rng.uniform(-7, 7, size=(2, 256, 4)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), {'points': pts})
        out = m.apply(params, {'points': pts})
        return params, out

    def test_outputs_bitwise_equal(self):
        p_on, out_on = self._run(True)
        p_off, out_off = self._run(False)
        jax.tree_util.tree_map(np.testing.assert_array_equal, p_on, p_off)
        np.testing.assert_array_equal(out_on['point_coords'], out_off['point_coords'])
        np.testing.assert_array_equal(out_on['point_features'], out_off['point_features'])
        for a, b in zip(out_on['sa_xyz'], out_off['sa_xyz']):
            np.testing.assert_array_equal(a, b)


class TestRandomSampling:
    """'random' sampling semantics (ADVICE r3): with a 'sampling' rng the SA
    module draws a true uniform permutation; without one, 'random' after an
    FPS-ordered level warns and degrades to the deterministic prefix."""

    def _module(self):
        from pdm_ssd_tpu.models.backbones_3d.pointnet2_backbone import \
            SAModuleMSG
        return SAModuleMSG(npoint=16, radii=[0.8], nsamples=[8],
                           mlps=[[8, 8]], sample_method='random')

    def test_sampling_rng_draws_uniform_permutation(self):
        rng = np.random.RandomState(3)
        xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        mod = self._module()
        params = mod.init({'params': jax.random.PRNGKey(0),
                           'sampling': jax.random.PRNGKey(1)}, xyz, None)
        picks = []
        for seed in (1, 2):
            new_xyz, _ = mod.apply(params, xyz, None,
                                   rngs={'sampling': jax.random.PRNGKey(seed)})
            # every sampled center is a row of the input, no duplicates
            d = np.linalg.norm(np.asarray(new_xyz)[:, :, None]
                               - np.asarray(xyz)[:, None], axis=-1)
            src = d.argmin(-1)
            assert (d.min(-1) < 1e-6).all()
            assert all(len(set(r)) == len(r) for r in src)
            picks.append(src)
        assert not np.array_equal(picks[0], picks[1]), \
            'different sampling keys must draw different subsets'

    def test_no_rng_falls_back_to_prefix(self):
        rng = np.random.RandomState(4)
        xyz = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
        mod = self._module()
        params = mod.init(jax.random.PRNGKey(0), xyz, None)
        new_xyz, _ = mod.apply(params, xyz, None)
        np.testing.assert_allclose(np.asarray(new_xyz),
                                   np.asarray(xyz)[:, :16])

    def test_backbone_warns_on_fps_ordered_random(self):
        import warnings as _w
        from pdm_ssd_tpu.models.backbones_3d.pointnet2_backbone import \
            PointNet2MSG
        from pdm_ssd_tpu.utils.config import CfgNode
        cfg = CfgNode({'SA_CONFIG': {
            'NPOINTS': [32, 16], 'RADIUS': [[0.8], [1.6]],
            'NSAMPLE': [[8], [8]], 'MLPS': [[[8]], [[8]]],
            'SAMPLE_METHOD': ['fps', 'random']}, 'FP_MLPS': []})
        net = PointNet2MSG(model_cfg=cfg, input_channels=3)
        pts = jnp.asarray(np.random.RandomState(5).randn(1, 64, 4),
                          jnp.float32)
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter('always')
            net.init(jax.random.PRNGKey(0), {'points': pts})
        assert any('deterministic FPS prefix' in str(w.message) for w in rec)
