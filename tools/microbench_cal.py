"""Calibration: known-cost ops in the unrolled-loop harness."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

LOOPS = 10


def _fetch(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))


def bench(name, fn, *args, reps=3, flops=None, byts=None):
    @jax.jit
    def looped(*a):
        carry = jnp.float32(0)
        for _ in range(LOOPS):
            out = fn(*a, carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            carry = carry + leaf.ravel()[0].astype(jnp.float32) * 1e-20
        return carry

    _fetch(looped(*args))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(looped(*args))
        best = min(best, (time.perf_counter() - t0) / LOOPS * 1e3)
    extra = ''
    if flops:
        extra += f' ({flops / best * 1e-9:.2f} TF/s)'
    if byts:
        extra += f' ({byts / best * 1e-6:.0f} GB/s)'
    print(f'{name}: {best:.3f} ms{extra}')


def main():
    key = jax.random.PRNGKey(0)

    a = jax.random.normal(key, (2048, 2048), jnp.bfloat16)
    bench('matmul 2048^3 bf16', lambda a, s: jax.lax.dot(
        a + s.astype(jnp.bfloat16), a, preferred_element_type=jnp.float32),
        a, flops=2 * 2048**3)

    a4 = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    bench('matmul 4096^3 bf16', lambda a, s: jax.lax.dot(
        a + s.astype(jnp.bfloat16), a, preferred_element_type=jnp.float32),
        a4, flops=2 * 4096**3)

    sm = jax.random.normal(key, (256, 256), jnp.bfloat16)
    bench('matmul 256^3 bf16', lambda a, s: jax.lax.dot(
        a + s.astype(jnp.bfloat16), a, preferred_element_type=jnp.float32),
        sm, flops=2 * 256**3)

    big = jax.random.normal(key, (64, 1024, 1024), jnp.float32)  # 256MB
    bench('copy 256MB f32 (read+write)', lambda x, s: x + s, big,
          byts=2 * big.size * 4)

    med = jax.random.normal(key, (8, 1024, 1024), jnp.float32)  # 32MB
    bench('copy 32MB f32', lambda x, s: x + s, med, byts=2 * med.size * 4)

    tiny = jax.random.normal(key, (8, 128), jnp.float32)
    bench('copy 4KB f32 (floor probe)', lambda x, s: x + s, tiny)

    # batched matmul at grouped-MLP-ish shape
    x = jax.random.normal(key, (1048576, 32), jnp.bfloat16)
    w = jax.random.normal(key, (32, 64), jnp.bfloat16)
    bench('matmul (1M,32)@(32,64) bf16', lambda x, w, s: jax.lax.dot(
        x + s.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32),
        x, w, flops=2 * 1048576 * 32 * 64)


if __name__ == '__main__':
    main()
