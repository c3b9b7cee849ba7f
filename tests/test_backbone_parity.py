"""Full-backbone oracle parity: the reference's OWN torch `PointNet2MSG`
(`pcdet/models/backbones_3d/pointnet2_backbone.py:9-96`, SA/FP modules
`pcdet/ops/pointnet2/pointnet2_batch/pointnet2_modules.py:10-171`) vs the JAX
backbone, weights ported layer-for-layer, on a fixed random cloud.

The four CUDA kernels are replaced by clean-room torch-CPU shims
(`ref_pointnet2_shim.py`) written from the kernel contracts; every learned
layer, the module composition, the FPS/ball-query/grouping semantics AND the
JAX backbone's FPS prefix elision (levels >= 2 skip the serial chain — see
`pointnet2_backbone.SAModuleMSG` docstring) are all exercised against the
reference's recompute-FPS-each-level behavior. This is the parity family the
flagship's backbone belongs to (PDM-SSD = PointNet2MSG + PDM neck + hybrid
head; the neck/head are paper-only — no reference torch code exists).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

import ref_oracle
import ref_pointnet2_shim

ref_oracle.install()


@pytest.fixture(scope='module', autouse=True)
def _pointnet2_shim():
    """Scope the torch.cuda.*Tensor monkeypatch (ref_pointnet2_shim:install)
    to this module instead of leaking it process-wide (ADVICE r3)."""
    ref_pointnet2_shim.install()
    yield
    ref_pointnet2_shim.uninstall()

from pdm_ssd_tpu.utils.config import CfgNode


SA = {
    'NPOINTS': [32, 16],
    'RADIUS': [[0.5, 1.0], [1.0, 2.0]],
    'NSAMPLE': [[8, 16], [8, 16]],
    'MLPS': [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
    'USE_XYZ': True,
}
FP = [[8, 8], [16, 16]]
B, N, C_IN = 2, 128, 1          # input points: xyz + intensity


def _randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, bn.weight.shape[0]).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.normal(0, 0.1, bn.bias.shape[0]).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.1, bn.running_mean.shape[0]).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, bn.running_var.shape[0]).astype(np.float32)))


def build_torch_backbone(rng):
    mod = ref_oracle.load('pcdet.models.backbones_3d.pointnet2_backbone')
    ED = ref_oracle._EasyDict
    cfg = ED({'SA_CONFIG': ED({k: [list(v) if isinstance(v, list) else v for v in vv]
                               if isinstance(vv, list) else vv
                               for k, vv in SA.items()}),
              'FP_MLPS': [list(m) for m in FP]})
    net = mod.PointNet2MSG(model_cfg=cfg, input_channels=3 + C_IN)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            _randomize_bn(m, rng)
    net.eval()
    return net


def port_weights(net, params, batch_stats):
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    def copy_shared_mlp(seq, tgt_p, tgt_bs):
        convs = [m for m in seq if isinstance(m, torch.nn.Conv2d)]
        bns = [m for m in seq if isinstance(m, torch.nn.BatchNorm2d)]
        for j, (cv, bn) in enumerate(zip(convs, bns)):
            tgt_p[f'Dense_{j}']['kernel'] = cv.weight.detach().numpy()[:, :, 0, 0].T
            tgt_p[f'BatchNorm_{j}'] = {'scale': bn.weight.detach().numpy(),
                                       'bias': bn.bias.detach().numpy()}
            tgt_bs[f'BatchNorm_{j}'] = {'mean': bn.running_mean.numpy(),
                                        'var': bn.running_var.numpy()}

    for k, sa in enumerate(net.SA_modules):
        for i, mlp in enumerate(sa.mlps):
            copy_shared_mlp(mlp, params[f'sa_{k}'][f'mlp_{i}'],
                            batch_stats[f'sa_{k}'][f'mlp_{i}'])
    for k, fp in enumerate(net.FP_modules):
        copy_shared_mlp(fp.mlp, params[f'fp_{k}']['mlp'],
                        batch_stats[f'fp_{k}']['mlp'])
    return (jax.tree_util.tree_map(jnp.asarray, params),
            jax.tree_util.tree_map(jnp.asarray, batch_stats))


def test_pointnet2msg_full_backbone_parity():
    from pdm_ssd_tpu.models.backbones_3d.pointnet2_backbone import PointNet2MSG

    rng = np.random.RandomState(11)
    net = build_torch_backbone(rng)

    pts = rng.uniform(-4, 4, size=(B, N, 3)).astype(np.float32)
    feat = rng.randn(B, N, C_IN).astype(np.float32)

    # --- torch forward (stacked (B*N, 1+3+C) layout)
    batch_idx = np.repeat(np.arange(B, dtype=np.float32), N)[:, None]
    tpoints = torch.from_numpy(np.concatenate(
        [batch_idx, pts.reshape(-1, 3), feat.reshape(-1, C_IN)], axis=1)).contiguous()
    with torch.no_grad():
        tout = net({'batch_size': B, 'points': tpoints})
    t_feats = tout['point_features'].numpy().reshape(B, N, -1)
    t_coords = tout['point_coords'].numpy()[:, 1:4].reshape(B, N, 3)

    # --- JAX forward (batched layout), FPS prefix elision ON (the default)
    jcfg = CfgNode({'SA_CONFIG': dict(SA), 'FP_MLPS': [list(m) for m in FP]})
    jnet = PointNet2MSG(model_cfg=jcfg, input_channels=3 + C_IN, pc_range=None)
    jpoints = jnp.asarray(np.concatenate([pts, feat], axis=-1))
    variables = jnet.init(jax.random.PRNGKey(0), {'points': jpoints})
    p, bs = port_weights(net, variables['params'], variables['batch_stats'])
    jout = jnet.apply({'params': p, 'batch_stats': bs}, {'points': jpoints})

    np.testing.assert_array_equal(np.asarray(jout['point_coords']), t_coords)
    np.testing.assert_allclose(np.asarray(jout['point_features']), t_feats,
                               atol=1e-4, rtol=1e-4)


def test_shim_matches_jax_ops():
    """The torch shims and the JAX exact ops implement the same kernel
    contracts — cross-check them directly on a random cloud."""
    from pdm_ssd_tpu.ops import pointnet2 as p2

    rng = np.random.RandomState(5)
    xyz = rng.uniform(-3, 3, size=(2, 96, 3)).astype(np.float32)
    t_idx = ref_pointnet2_shim._fps_indices(torch.from_numpy(xyz), 24).numpy()
    j_idx = np.asarray(p2.farthest_point_sample(jnp.asarray(xyz), 24))
    np.testing.assert_array_equal(t_idx, j_idx)

    centers = xyz[:, :16]
    t_bq = torch.zeros(2, 16, 8, dtype=torch.int32)
    ref_pointnet2_shim.ball_query_wrapper(
        2, 96, 16, 1.2, 8, torch.from_numpy(centers), torch.from_numpy(xyz), t_bq)
    j_bq = np.asarray(p2.ball_query(1.2, 8, jnp.asarray(xyz), jnp.asarray(centers)))
    np.testing.assert_array_equal(t_bq.numpy(), j_bq)
