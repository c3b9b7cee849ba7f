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
    # top-2 per block: exact unless THREE of the true top-k share one block
    # (measured: top-1-per-block lost ~20% of the top-K score mass on peaked
    # CenterNet heatmaps — clustered near-peak candidates share blocks; the
    # top-2 form recovers >99.9%, see tests/test_selection_exactness.py)
    m1 = jnp.max(xb, axis=-1)
    a1 = jnp.argmax(xb, axis=-1).astype(jnp.int32)
    iota = jnp.arange(block, dtype=jnp.int32)
    masked = jnp.where(iota == a1[..., None], -jnp.inf, xb)
    m2 = jnp.max(masked, axis=-1)
    a2 = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    nb = n_pad // block
    cand_v = jnp.concatenate([m1, m2], axis=-1)            # (..., 2*nb)
    boff = jnp.concatenate([jnp.arange(nb), jnp.arange(nb)]) * block
    cand_i = jnp.concatenate([a1, a2], axis=-1) + boff.astype(jnp.int32)
    vals, sel = jax.lax.top_k(cand_v, k)
    idx = jnp.take_along_axis(cand_i, sel, axis=-1)
    return vals, idx.astype(jnp.int32)
