"""Analytic model-FLOP counter: walk a function's jaxpr and sum the MXU
FLOPs of every `dot_general` / `conv_general_dilated` (2*M*N*K), recursing
through pjit/custom_vjp/remat/scan (scan multiplies by trip count).

Used by `tools/mfu_report.py` to turn measured step times into MFU numbers
(VERDICT r3 item 10) — the TPU answer to the reference's absent FLOPs
accounting.
"""
from __future__ import annotations

import math

import jax
import numpy as np


def _dot_flops(eqn) -> int:
    d = eqn.params['dimension_numbers']
    (lc, rc), (lb, rb) = d
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    batch = math.prod(lhs.shape[i] for i in lb)
    contract = math.prod(lhs.shape[i] for i in lc)
    m = math.prod(s for i, s in enumerate(lhs.shape)
                  if i not in lb and i not in lc)
    n = math.prod(s for i, s in enumerate(rhs.shape)
                  if i not in rb and i not in rc)
    return 2 * batch * m * n * contract


def _conv_flops(eqn) -> int:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval            # kernel (Cout, Cin/groups, spatial)
    dn = eqn.params['dimension_numbers']
    out_c_dim = dn.out_spec[1] if hasattr(dn, 'out_spec') else 1
    cout = out.shape[out_c_dim]
    # per-output-element MACs = kernel elements / Cout (kernel shape already
    # carries Cin/groups, so grouped convs are handled)
    macs_per_out = math.prod(rhs.shape) // max(cout, 1)
    return 2 * math.prod(out.shape) * macs_per_out


def count_flops(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == 'dot_general':
            total += _dot_flops(eqn)
        elif prim == 'conv_general_dilated':
            total += _conv_flops(eqn)
        elif prim == 'scan':
            inner = eqn.params['jaxpr'].jaxpr
            total += eqn.params['length'] * count_flops(inner)
        elif prim == 'while':
            # count one trip; callers should prefer scan for hot loops
            total += count_flops(eqn.params['body_jaxpr'].jaxpr)
        elif prim == 'cond':
            branches = eqn.params['branches']
            total += max(count_flops(b.jaxpr) for b in branches)
        else:
            for key in ('jaxpr', 'call_jaxpr', 'fun_jaxpr'):
                sub = eqn.params.get(key) if hasattr(eqn, 'params') else None
                if sub is not None:
                    total += count_flops(
                        sub.jaxpr if hasattr(sub, 'jaxpr') else sub)
                    break
    return total


def flops_of(fn, *args, **kwargs) -> int:
    """Total MXU FLOPs of one call of `fn(*args)` (traced, not executed)."""
    closed = jax.make_jaxpr(fn, **kwargs)(*args)
    return count_flops(closed.jaxpr)


if __name__ == '__main__':
    import jax.numpy as jnp
    a = np.zeros((128, 256), np.float32)
    b = np.zeros((256, 512), np.float32)
    got = flops_of(lambda x, y: x @ y, a, b)
    want = 2 * 128 * 256 * 512
    assert got == want, (got, want)
    print('self-check OK:', got)
