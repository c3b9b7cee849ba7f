"""Round-3 part 4: XLA gather bandwidth vs row width + brick-conv pieces.

If wide-row gathers approach HBM bandwidth, a brick-dense backbone
(dense 4x4x4 bricks, halo slab gathers, XLA conv3d) beats everything.
"""
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
    print(f'{name}: {best:.3f} ms{extra}', flush=True)
    return best


def main():
    jax.config.update('jax_default_matmul_precision', 'bfloat16')
    rng = np.random.default_rng(0)

    # ---- gather bandwidth curve: fixed total bytes (~200 MB), vary width
    total = 50 * 2**20  # 50M f32 elements = 200 MB gathered
    for width in (32, 64, 128, 256, 512, 1024, 2048):
        nrows = total // width
        tbl_rows = max(nrows // 4, 1024)
        tbl = jnp.asarray(rng.standard_normal((tbl_rows, width)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, tbl_rows, nrows), jnp.int32)

        def g(tbl, idx, s):
            return (tbl + s)[idx]

        bench(f'gather {nrows:>8} rows x {width*4:>5}B f32', g, tbl, idx,
              byts=total * 4)

    for width in (64, 256, 1024, 2048):
        nrows = (total * 2) // width
        tbl_rows = max(nrows // 4, 1024)
        tbl = jnp.asarray(rng.standard_normal((tbl_rows, width)), jnp.float32
                          ).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, tbl_rows, nrows), jnp.int32)

        def g(tbl, idx, s):
            return (tbl + s.astype(jnp.bfloat16))[idx]

        bench(f'gather {nrows:>8} rows x {width*2:>5}B bf16', g, tbl, idx,
              byts=total * 4)

    # ---- brick conv pieces (stage-2-ish: B=2 folded, C=32) ----
    NBK, C = 16384, 32
    table = jnp.asarray(
        rng.standard_normal((NBK, 4, 4, 4, C)), jnp.float32
    ).astype(jnp.bfloat16)
    nbr = jnp.asarray(rng.integers(0, NBK, (6, NBK)), jnp.int32)

    # x-halo = table row shift (sorted (bz,by,bx) order) + mask
    def xshift(table, s):
        t = table + s.astype(jnp.bfloat16)
        left = jnp.concatenate([t[-1:], t[:-1]], 0)[:, :, :, 3:4]
        right = jnp.concatenate([t[1:], t[:1]], 0)[:, :, :, 0:1]
        return jnp.concatenate([left, t, right], axis=3)  # (NBK,4,4,6,C)

    bench('brick x-halo shift bf16   ', xshift, table,
          byts=3 * NBK * 4 * 4 * 6 * C * 2)

    # y-halo: gather y=3 / y=0 slabs of neighbor bricks (pre-sliced tables)
    def yhalo(table, nbr, s):
        t = table + s.astype(jnp.bfloat16)
        lo_slab = t[:, :, 3].reshape(NBK, 4 * 4 * C)    # (NBK, 16C)
        hi_slab = t[:, :, 0].reshape(NBK, 4 * 4 * C)
        a = lo_slab[nbr[0]]
        b = hi_slab[nbr[1]]
        return a + b

    bench('brick y-halo 2 slab gathers', yhalo, table, nbr,
          byts=2 * NBK * 16 * C * 2)

    # full halo-extended conv: (NBK, 6,6,6, C) -> (NBK, 4,4,4, C), 3^3 kernel
    ext = jnp.asarray(
        rng.standard_normal((NBK, 6, 6, 6, C)), jnp.float32
    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.05,
                    jnp.float32).astype(jnp.bfloat16)

    def conv(ext, w, s):
        return jax.lax.conv_general_dilated(
            ext + s.astype(jnp.bfloat16), w, (1, 1, 1), 'VALID',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
            preferred_element_type=jnp.float32)

    bench('brick conv3d 6^3->4^3 C32  ', conv, ext, w,
          flops=2 * NBK * 64 * 27 * C * C)

    # conv as 27 shifted matmuls (manual im2col-free form)
    def conv_mm(ext, w, s):
        e = ext + s.astype(jnp.bfloat16)
        acc = jnp.zeros((NBK, 4, 4, 4, C), jnp.float32)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    win = e[:, dz:dz + 4, dy:dy + 4, dx:dx + 4]
                    acc = acc + jnp.einsum(
                        'bzyxc,cd->bzyxd', win, w[dz, dy, dx],
                        preferred_element_type=jnp.float32)
        return acc

    bench('brick conv as 27 matmuls   ', conv_mm, ext, w,
          flops=2 * NBK * 64 * 27 * C * C)

    # C=64 variant conv
    ext64 = jnp.asarray(
        rng.standard_normal((NBK // 2, 6, 6, 6, 64)), jnp.float32
    ).astype(jnp.bfloat16)
    w64 = jnp.asarray(rng.standard_normal((3, 3, 3, 64, 64)) * 0.05,
                      jnp.float32).astype(jnp.bfloat16)
    bench('brick conv3d 6^3->4^3 C64  ', conv, ext64, w64,
          flops=2 * (NBK // 2) * 64 * 27 * 64 * 64)


if __name__ == '__main__':
    main()
