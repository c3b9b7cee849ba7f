"""SyncBN-by-construction: under jit with the batch sharded over the data
axis, BatchNorm reduces over the GLOBAL batch (XLA inserts the cross-device
mean), so per-device and 8-device runs produce identical batch stats —
the claim in parallel/mesh.py and PARITY.md, verified."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pdm_ssd_tpu.parallel import make_mesh, replicate, shard_batch


class TinyBN(nn.Module):
    @nn.compact
    def __call__(self, x, training=True):
        x = nn.Dense(8)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9)(x)
        return x


def test_bn_stats_match_sharded_vs_single(rng):
    x = rng.randn(8, 16, 4).astype(np.float32)
    model = TinyBN()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))

    @jax.jit
    def step(v, xb):
        out, mut = model.apply(v, xb, training=True, mutable=['batch_stats'])
        return out, mut['batch_stats']

    # single-device reference
    out_ref, stats_ref = step(variables, jnp.asarray(x))

    # 8-way data parallel
    mesh = make_mesh()
    v_rep = replicate(variables, mesh)
    xb = shard_batch({'x': x}, mesh)['x']
    out_dp, stats_dp = step(v_rep, xb)

    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_dp),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(stats_ref),
                    jax.tree_util.tree_leaves(stats_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
