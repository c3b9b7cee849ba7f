"""Farthest point sampling as a single Pallas TPU kernel.

TPU-native replacement for `farthest_point_sampling_kernel`
(`pcdet/ops/pointnet2/pointnet2_batch/src/sampling_gpu.cu:100-260`) and for the
pure-JAX `lax.scan` reference (`ops/pointnet2.farthest_point_sample`): the
whole max-min iteration runs inside ONE kernel with the distance cache and
point coordinates resident in VMEM — no per-step XLA loop dispatch (the scan
costs ~45us/step in loop overhead; this kernel does the same step in ~1us).

Layout: coordinates enter as (B, 3, N) so each coordinate row is a clean
lane-major vector; in-kernel state is (B*3, N) and (B, N) VMEM blocks. The
batch is processed simultaneously: every iteration updates all B distance rows
and emits one index per row.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e10


def _fps_kernel(xyz_ref, out_ref, dist_ref, *, npoint: int, n: int, b: int):
    # xyz_ref: (B*3, N) rows [x0..xB-1, y0.., z0..]; out_ref: (npoint, B) int32
    # (index-major layout so the per-step store is a dynamic sublane store)
    # dist_ref: (B, N) f32 scratch
    dist_ref[...] = jnp.full((b, n), BIG, jnp.float32)
    out_ref[pl.ds(0, 1), :] = jnp.zeros((1, b), jnp.int32)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, n), dimension=1)

    def step(i, last):
        # last: (B,) int32 indices chosen in the previous iteration — passed as
        # a small carried array.
        xs = xyz_ref[0:b, :]          # (B, N)
        ys = xyz_ref[b:2 * b, :]
        zs = xyz_ref[2 * b:3 * b, :]
        # gather the coords of the last-selected point of each row via one-hot
        onehot = (col_ids == last[:, None]).astype(jnp.float32)   # (B, N)
        x0 = jnp.sum(xs * onehot, axis=1, keepdims=True)          # (B, 1)
        y0 = jnp.sum(ys * onehot, axis=1, keepdims=True)
        z0 = jnp.sum(zs * onehot, axis=1, keepdims=True)
        d = (xs - x0) ** 2 + (ys - y0) ** 2 + (zs - z0) ** 2
        dist = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = dist
        m = jnp.max(dist, axis=1, keepdims=True)                  # (B, 1)
        nxt = jnp.min(jnp.where(dist == m, col_ids, n), axis=1)   # (B,) first argmax
        nxt = nxt.astype(jnp.int32)
        out_ref[pl.ds(i, 1), :] = nxt[None, :]
        return nxt

    jax.lax.fori_loop(1, npoint, step, jnp.zeros((b,), jnp.int32))


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """xyz: (B, N, 3) -> (B, npoint) int32. Semantics identical to the pure-JAX
    reference (seed index 0, first-argmax tie break)."""
    # index output, no gradient — like the reference's autograd.Function with
    # no backward (`sampling_gpu.cu` wrapper). Without this, any symbolic
    # tangent on xyz (e.g. the PointRCNN ROI head's canonical cloud, sliced
    # from a concat that includes learned point scores) hits pallas_call's
    # missing JVP rule and crashes the train step.
    xyz = jax.lax.stop_gradient(xyz)
    B, N, _ = xyz.shape
    x = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1)).reshape(B * 3, N)
    # rows grouped coordinate-major: [x0..xB, y0..yB, z0..zB]
    x = x.reshape(B, 3, N).transpose(1, 0, 2).reshape(3 * B, N)
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint, n=N, b=B),
        out_shape=jax.ShapeDtypeStruct((npoint, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
    )(x)
    return out.T
