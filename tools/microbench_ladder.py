"""Round-3: per-piece timing of the sparse ladder at production shapes.

Builds REAL kernel maps (synthetic cloud at 0.05 m) and times each stage's
gather / gather+matmul / full layer separately, in f32 and bf16, xwin and
plain — to locate where the measured ~121 ms full-ladder forward goes.
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

LOOPS = 10


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_default_matmul_precision', 'bfloat16')

    from pdm_ssd_tpu.ops.sparse_maps import batch_build_backbone8x
    from pdm_ssd_tpu.models.backbones_3d.sparse_backbone import (
        gather_taps, gather_taps_xwin, xwin_plan,
        gather_taps_qwin, qwin_plan)
    from bench_utils_sparse import make_coords

    B = 2
    caps = [16000, 52000, 52000, 36000, 35000]
    coords, mask = make_coords(B, caps[0])
    maps = batch_build_backbone8x(coords, mask, (1408, 1600, 41), caps)
    maps = {k: jnp.asarray(v) for k, v in maps.items()}

    def _fetch(x):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))

    def bench(name, fn, *args, reps=3):
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
        print(f'{name}: {best:.3f} ms', flush=True)
        return best

    # stage structure: (table_key_cap, nbr, C, n_layers_sharing_this_map)
    stages = [
        ('s1 subm C16', caps[0], maps['sp_submap1'], 16, 2),
        ('s2 down C16->32', caps[0], maps['sp_downmap2'], 16, 1),
        ('s2 subm C32', caps[1], maps['sp_submap2'], 32, 2),
        ('s3 down C32->64', caps[1], maps['sp_downmap3'], 32, 1),
        ('s3 subm C64', caps[2], maps['sp_submap3'], 64, 2),
        ('s4 down C64->64', caps[2], maps['sp_downmap4'], 64, 1),
        ('s4 subm C64', caps[3], maps['sp_submap4'], 64, 2),
        ('out k311 C64->128', caps[3], maps['sp_outmap'], 64, 1),
    ]

    rng = np.random.default_rng(0)
    tot = {}
    for dt_name, dt in (('f32', jnp.float32), ('bf16', jnp.bfloat16)):
        print(f'---- {dt_name} ----')
        tot[f'xg_{dt_name}'] = tot[f'xl_{dt_name}'] = 0.0
        for name, cap_in, nbr, C, n_layers in stages:
            feats = jnp.asarray(
                rng.standard_normal((B, cap_in, C)), jnp.float32).astype(dt)
            K = nbr.shape[-1]
            w = jnp.asarray(rng.standard_normal((K * C, 2 * C)) * 0.05,
                            jnp.float32).astype(dt)
            if K % 3 == 0:
                plan = jax.jit(lambda n: xwin_plan(n, cap_in))(nbr)

                def xg(feats, plan, s):
                    return gather_taps_xwin(feats + s.astype(feats.dtype),
                                            plan)
                t = bench(f'{name:22s} xwin gather', xg, feats, plan)
                tot[f'xg_{dt_name}'] += t * n_layers

                def xl(feats, plan, w, s):
                    g = gather_taps_xwin(feats + s.astype(feats.dtype), plan)
                    return jax.lax.dot_general(
                        g, w, (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                t = bench(f'{name:22s} xwin g+mm ', xl, feats, plan, w)
                tot[f'xl_{dt_name}'] += t * n_layers

                qplan = jax.jit(lambda n: qwin_plan(n, cap_in))(nbr)

                def qg(feats, qplan, s):
                    return gather_taps_qwin(feats + s.astype(feats.dtype),
                                            qplan)
                t = bench(f'{name:22s} qwin gather', qg, feats, qplan)
                tot[f'qg_{dt_name}'] = tot.get(f'qg_{dt_name}', 0) \
                    + t * n_layers

                def ql(feats, qplan, w, s):
                    g = gather_taps_qwin(feats + s.astype(feats.dtype),
                                         qplan)
                    return jax.lax.dot_general(
                        g, w, (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                t = bench(f'{name:22s} qwin g+mm ', ql, feats, qplan, w)
                tot[f'ql_{dt_name}'] = tot.get(f'ql_{dt_name}', 0) \
                    + t * n_layers

            def pg(feats, nbr, s):
                return gather_taps(feats + s.astype(feats.dtype), nbr)
            bench(f'{name:22s} plain gather', pg, feats, nbr)
        print(f'xwin gathers total ({dt_name}): '
              f'{tot[f"xg_{dt_name}"]:.1f} ms; '
              f'gather+matmul total: {tot[f"xl_{dt_name}"]:.1f} ms')
        print(f'qwin gathers total ({dt_name}): '
              f'{tot[f"qg_{dt_name}"]:.1f} ms; '
              f'gather+matmul total: {tot[f"ql_{dt_name}"]:.1f} ms')


if __name__ == '__main__':
    main()
