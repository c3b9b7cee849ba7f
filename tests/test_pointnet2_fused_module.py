"""SAModuleMSGFused vs SAModuleMSG: numerical parity with mapped params.

On benign data (sparse cloud, generous cap, underfull balls) the two modules
must produce identical outputs: the fused path folds the first shared-MLP
Dense in front of the bucket table (linearity), and max-pool is invariant to
the selection-order differences documented in `ops/sa_fused.py`.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pdm_ssd_tpu.models.backbones_3d.pointnet2_backbone import (
    SAModuleMSG, SAModuleMSGFused)

PC = (0.0, -40.0, 70.4, 40.0)


def _map_params(ref_params, n_branches):
    """ref SAModuleMSG params -> fused module params."""
    out = {}
    for i in range(n_branches):
        mlp = ref_params['params'][f'mlp_{i}']
        k0 = mlp['Dense_0']['kernel']
        out[f'pre_xyz_{i}'] = {'kernel': k0[:3]}
        out[f'pre_feat_{i}'] = {'kernel': k0[3:]}
        out[f'bn0_{i}'] = mlp['BatchNorm_0']
        rest = {}
        j = 1
        while f'Dense_{j}' in mlp:
            rest[f'Dense_{j-1}'] = mlp[f'Dense_{j}']
            rest[f'BatchNorm_{j-1}'] = mlp[f'BatchNorm_{j}']
            j += 1
        if rest:
            out[f'mlp_rest_{i}'] = rest
    return {'params': out}


def _map_batch_stats(ref_vars, n_branches):
    bs = {}
    for i in range(n_branches):
        mlp = ref_vars['batch_stats'][f'mlp_{i}']
        bs[f'bn0_{i}'] = mlp['BatchNorm_0']
        rest = {}
        j = 1
        while f'BatchNorm_{j}' in mlp:
            rest[f'BatchNorm_{j-1}'] = mlp[f'BatchNorm_{j}']
            j += 1
        if rest:
            bs[f'mlp_rest_{i}'] = rest
    return bs


def test_fused_module_matches_reference():
    key = jax.random.PRNGKey(0)
    B, N, M = 2, 512, 64
    lo = jnp.array([PC[0], PC[1], -3.0])
    hi = jnp.array([PC[2], PC[3], 1.0])
    xyz = jax.random.uniform(key, (B, N, 3)) * (hi - lo) + lo
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, 5))

    kw = dict(npoint=M, radii=[1.5, 3.0], nsamples=[8, 16],
              mlps=[[16, 16], [16, 32]], sample_method='random',
              pc_range=PC)
    ref_mod = SAModuleMSG(**kw)
    fused_mod = SAModuleMSGFused(**kw, bucket_cap=128)

    ref_vars = ref_mod.init(jax.random.PRNGKey(2), xyz, feats)
    fused_params = {'params': {'agg': _map_params(ref_vars, 2)['params']}}
    fused_params['batch_stats'] = {'agg': _map_batch_stats(ref_vars, 2)}

    ref_xyz, ref_out = ref_mod.apply(ref_vars, xyz, feats, training=False)
    fus_xyz, fus_out = fused_mod.apply(fused_params, xyz, feats, training=False)

    np.testing.assert_allclose(np.asarray(ref_xyz), np.asarray(fus_xyz))
    r = np.asarray(ref_out)
    f = np.asarray(fus_out)
    # bf16 extraction tolerance; empty balls allowed to differ (zeros vs
    # reference point-0 garbage) — on this sparse cloud big radii keep all
    # balls non-empty, but guard anyway by masking centers with no neighbor
    d = np.linalg.norm(np.asarray(xyz)[:, None, :, :] -
                       np.asarray(ref_xyz)[:, :, None, :], axis=-1)
    nonempty = (d < 1.5).sum(-1) > 0
    mask = np.asarray(nonempty)
    np.testing.assert_allclose(r[mask], f[mask], rtol=0.05, atol=0.05)


def test_fused_module_grad():
    key = jax.random.PRNGKey(3)
    B, N, M = 1, 256, 32
    lo = jnp.array([PC[0], PC[1], -3.0])
    hi = jnp.array([PC[2], PC[3], 1.0])
    xyz = jax.random.uniform(key, (B, N, 3)) * (hi - lo) + lo
    feats = jax.random.normal(jax.random.PRNGKey(4), (B, N, 4))
    mod = SAModuleMSGFused(npoint=M, radii=[2.0], nsamples=[8], mlps=[[8, 16]],
                           sample_method='random', pc_range=PC)
    variables = mod.init(jax.random.PRNGKey(5), xyz, feats)

    def loss(p):
        _xyz, out = mod.apply({'params': p, 'batch_stats': variables['batch_stats']},
                              xyz, feats, training=False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables['params'])
    total = sum(np.abs(np.asarray(x)).sum() for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
