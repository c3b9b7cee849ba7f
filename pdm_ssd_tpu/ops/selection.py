"""Fast top-K selection helpers.

`two_stage_topk`: blockwise max-reduce + small top_k. A direct `lax.top_k`
over ~100k-wide rows costs ~25ms on this TPU (full sort); the two-stage form
runs in ~3ms. Used by the CenterHead decode and the anchor-head / NMS
pre-selection.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2))
def two_stage_topk(x: jax.Array, k: int, block: int = 16):
    """x: (..., N) -> (values, indices) of shape (..., k).

    Exact except when two of the final top-k fall in the same length-`block`
    window (choose block so N/block >> k)."""
    n = x.shape[-1]
    k = min(k, n)
    lead = x.shape[:-1]
    if n // block <= k:  # too few blocks for the two-stage trick
        return jax.lax.top_k(x, k)
    n_pad = (n + block - 1) // block * block
    if n_pad != n:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, n_pad - n)],
                    constant_values=-jnp.inf)
    xb = x.reshape(lead + (n_pad // block, block))
    bmax = jnp.max(xb, axis=-1)
    barg = jnp.argmax(xb, axis=-1).astype(jnp.int32)
    vals, bidx = jax.lax.top_k(bmax, k)
    idx = bidx * block + jnp.take_along_axis(barg, bidx, axis=-1)
    return vals, idx.astype(jnp.int32)
