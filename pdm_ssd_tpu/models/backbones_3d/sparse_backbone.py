"""TPU-native sparse voxel backbone (gather-matmul submanifold/strided convs).

Re-design of spconv's `VoxelBackBone8x` / `VoxelResBackBone8x`
(`pcdet/models/backbones_3d/spconv_backbone.py:70-180,184-270`): instead of
GPU rulebook scatter-gather convolution, each layer is

    gather neighbors from a fixed-capacity slot table  ->  one (V, K*Cin)
    @ (K*Cin, Cout) matmul on the MXU  ->  masked BatchNorm over active
    slots  ->  ReLU

with the neighbor tables precomputed on the host from voxel coordinates
(`ops/sparse_maps.py`) — they depend only on geometry, so the device graph
is static-shape and 100% gather+matmul. Active sets per stage live in
fixed-capacity padded tables `(B, cap_s, C)` with boolean masks; the "absent
neighbor" slot `cap` reads a zero row, which reproduces sparse-conv
semantics exactly (missing taps contribute nothing).

This unlocks the reference's native 0.05 m KITTI regime (1408x1600x41),
which the dense ladder cannot hold in HBM (stage-1 dense activation alone
would be 5.4 GiB/sample).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.sparse_maps import ladder_shapes
from ...utils.config import as_cfg


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the *active* rows of a padded slot table — the exact
    analog of the reference's `nn.BatchNorm1d(eps=1e-3, momentum=0.01)` over
    spconv's ragged feature list. Statistics are computed over all valid
    rows in the global batch; under pjit the sums are global, so this is
    SyncBN by construction (matching the repo-wide convention)."""
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, training: bool = False):
        C = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        if training:
            m = mask[..., None].astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x.astype(jnp.float32) * m, axis=red) / cnt
            var = jnp.sum(jnp.square(x.astype(jnp.float32) - mean) * m,
                          axis=red) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value \
                    + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value \
                    + (1.0 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[..., None], y, 0.0).astype(x.dtype)


def gather_taps(feats, nbr):
    """feats (B, Vin, C) slot table, nbr (B, Vout, K) slot indices with
    `Vin` meaning "absent" -> (B, Vout, K*C). The zero pad row makes absent
    taps contribute nothing to the matmul.

    The batch is FLATTENED into the row dimension before the gather:
    XLA:TPU lowers a batched (vmap) gather ~2.7x slower than the same
    gather over a flat table (8.8 vs 3.3 ns/row, round-3 measurement in
    tools/microbench_sparse_gather*.py)."""
    B, Vin, C = feats.shape
    Vout, K = nbr.shape[1], nbr.shape[2]
    table = jnp.concatenate([feats, jnp.zeros((B, 1, C), feats.dtype)], axis=1)
    boff = (jnp.arange(B, dtype=nbr.dtype) * (Vin + 1))[:, None, None]
    g = table.reshape(B * (Vin + 1), C)[(nbr + boff).reshape(B * Vout, K)]
    return g.reshape(B, Vout, K * C)


def xwin_plan(nbr, pad):
    """Precompute the window-fetch plan for a 27-tap (or 9-tap 2D) kernel
    map — shared by every conv layer of a stage, so the per-layer graph is
    just one gather + selects + matmul.

    The slot table is sorted by flat key (z, y, x) with x innermost, so the
    three x-taps of each (dz, dy) group live in *adjacent* slots whenever
    their cells are consecutively active; consecutive x cells always occupy
    consecutive slots (their flat keys are consecutive integers). Returns
    j: (B, V, G) window-center index into the front-zero-padded table
    (pad+1 = absent) and pick: (B, V, G, 3) in {0,1,2,3} — which window row
    each tap reads (3 = masked)."""
    B, V, K = nbr.shape
    G = K // 3
    l = nbr.reshape(B, V, G, 3)
    l0 = jnp.where(l[..., 0] < pad, l[..., 0] + 1, pad + 1)
    l1 = jnp.where(l[..., 1] < pad, l[..., 1] + 1, pad + 1)
    l2 = jnp.where(l[..., 2] < pad, l[..., 2] + 1, pad + 1)
    real0, real1, real2 = (l0 <= pad), (l1 <= pad), (l2 <= pad)
    j = jnp.where(real1, l1,
                  jnp.where(real0, l0 + 1,
                            jnp.where(real2, l2 - 1, pad + 1)))
    picks = []
    for lt, real in ((l0, real0), (l1, real1), (l2, real2)):
        off = lt - (j - 1)
        ok = real & (off >= 0) & (off <= 2)
        picks.append(jnp.where(ok, off, 3).astype(jnp.int8))
    return j, jnp.stack(picks, -1)


def gather_taps_xwin(feats, plan):
    """Window-fetch gather using a precomputed `xwin_plan`: 9 gathered rows
    of 3C per site instead of 27 rows of C (XLA's TPU row gather is
    latency-bound, ~6 ns/row — round-2 calibration), bitwise identical to
    the plain 27-row gather (tests/test_sparse_backbone.py).

    The gather is flat-batch (batch folded into the row dim) for the same
    reason as `gather_taps`; round-3's vmap formulation was both slower and
    implicated in the pathological XLA:TPU lowering at production shapes."""
    j, pick = plan
    B, Vin, C = feats.shape
    V, G = j.shape[1], j.shape[2]
    zero = jnp.zeros((B, 1, C), feats.dtype)
    table2 = jnp.concatenate([zero, feats, zero], axis=1)  # (B, Vin+2, C)
    xm = jnp.concatenate([zero, table2[:, :-1]], axis=1)
    xp = jnp.concatenate([table2[:, 1:], zero], axis=1)
    x3 = jnp.concatenate([xm, table2, xp], axis=-1)       # (B, Vin+2, 3C)
    boff = (jnp.arange(B, dtype=j.dtype) * (Vin + 2))[:, None, None]
    g3 = x3.reshape(B * (Vin + 2), 3 * C)[(j + boff).reshape(B * V * G)]
    g3 = g3.reshape(B, V, G, 3 * C)
    w = (g3[..., :C], g3[..., C:2 * C], g3[..., 2 * C:])
    outs = []
    for t in range(3):
        pt = pick[..., t]
        picked = jnp.where((pt == 0)[..., None], w[0], 0.0) \
            + jnp.where((pt == 1)[..., None], w[1], 0.0) \
            + jnp.where((pt == 2)[..., None], w[2], 0.0)
        outs.append(picked)
    g = jnp.stack(outs, axis=3)                           # (B, V, G, 3, C)
    return g.reshape(B, V, G * 3 * C)


def qwin_plan(nbr, pad):
    """Quad-window fetch plan for a 27-tap kernel map: pack every 4
    consecutive output slots x (dz, dy) tap group into ONE 6-slot window
    based at j = min(present tap slots). Halves the gathered bytes vs
    `xwin_plan` (9 rows of 6C per 4 sites = 13.5C/site vs 27C/site); taps
    whose slot offset exceeds 5 are zeroed here and re-added exactly by the
    host-built correction list (`ops/sparse_maps.qwin_corr_buckets`).

    Returns (r (B, G4, 9) int32 row into the front/back-zero-padded 6C
    window table, pick (B, G4, 4, 9, 3) int8 in {0..5, 6=zero}). The
    gather emits ceil(V/4)*4 rows; the caller slices back to V."""
    B, V, K = nbr.shape
    G = K // 3
    V4 = -(-V // 4) * 4
    if V4 != V:
        nbr = jnp.pad(nbr, ((0, 0), (0, V4 - V), (0, 0)),
                      constant_values=pad)
    l = nbr.reshape(B, V4 // 4, 4, G, 3)
    present = l < pad
    lm = jnp.where(present, l, jnp.iinfo(jnp.int32).max)
    j = lm.min(axis=(2, 4))                                # (B, G4, G)
    any_p = present.any(axis=(2, 4))
    r = jnp.where(any_p, j + 1, pad + 1).astype(jnp.int32)
    off = l - j[:, :, None, :, None]
    pick = jnp.where(present & (off <= 5), off, 6).astype(jnp.int8)
    return r, pick


def gather_taps_qwin(feats, plan):
    """Quad-window gather using a `qwin_plan`: one 6C row per (4-site
    group, tap group) instead of xwin's 3C row per (site, tap group) —
    half the gathered bytes at 2x the extraction selects (VPU work at HBM
    copy rates, far above the ~50 GB/s gather ceiling; BENCH_NOTES round
    3). Equal to the plain 27-row gather wherever `pick < 6`; overflow
    taps read zero and are restored by the correction list."""
    r, pick = plan
    B, Vin, C = feats.shape
    G4, G = r.shape[1], r.shape[2]
    zero1 = jnp.zeros((B, 1, C), feats.dtype)
    zero6 = jnp.zeros((B, 6, C), feats.dtype)
    P = jnp.concatenate([zero1, feats, zero6], axis=1)     # (B, Vin+7, C)
    # x6[r] = [feats[r-1], ..., feats[r+4]]; row Vin+1 is all-zero
    x6 = jnp.concatenate([P[:, k:k + Vin + 2] for k in range(6)], axis=-1)
    boff = (jnp.arange(B, dtype=r.dtype) * (Vin + 2))[:, None, None]
    g = x6.reshape(B * (Vin + 2), 6 * C)[(r + boff).reshape(-1)]
    g = g.reshape(B, G4, 1, G, 1, 6, C)
    out = jnp.zeros((B, G4, 4, G, 3, C), feats.dtype)
    sel = pick[..., None]                                  # (B,G4,4,G,3,1)
    for o in range(6):
        out = out + jnp.where(sel == o, g[..., o, :], 0.0)
    return out.reshape(B, G4 * 4, G * 3 * C)


def pwin_plan(nbr, pad):
    """Pair-window fetch plan for a 27-tap kernel map: pack every 2
    consecutive output slots x (dz, dy) tap group into ONE 4-slot window
    based at j = min(present tap slots). vs `xwin_plan`: 2x fewer gathered
    ROWS (9 per site pair instead of 9 per site) and 1.5x fewer bytes
    (4C per 2 sites = 2C/site vs 3C/site) — the ladder is row-latency /
    gather-bandwidth bound (BENCH_NOTES round 3), and pair coverage on
    0.05 m clouds is 89-100% per map, far above the quad variant's. Taps
    whose slot offset exceeds 3 are zeroed here and re-added exactly by the
    host-built correction list (`ops/sparse_maps.pwin_corr_buckets`).

    Returns (r (B, G2, G) int32 row into the front/back-zero-padded 4C
    window table, pick (B, G2, 2, G, 3) int8 in {0..3, 4=zero}). The
    gather emits ceil(V/2)*2 rows; the caller slices back to V."""
    B, V, K = nbr.shape
    G = K // 3
    V2 = -(-V // 2) * 2
    if V2 != V:
        nbr = jnp.pad(nbr, ((0, 0), (0, V2 - V), (0, 0)),
                      constant_values=pad)
    l = nbr.reshape(B, V2 // 2, 2, G, 3)
    present = l < pad
    lm = jnp.where(present, l, jnp.iinfo(jnp.int32).max)
    j = lm.min(axis=(2, 4))                                # (B, G2, G)
    any_p = present.any(axis=(2, 4))
    r = jnp.where(any_p, j + 1, pad + 1).astype(jnp.int32)
    off = l - j[:, :, None, :, None]
    pick = jnp.where(present & (off <= 3), off, 4).astype(jnp.int8)
    return r, pick


def gather_taps_pwin(feats, plan):
    """Pair-window gather using a `pwin_plan`: one 4C row per (site pair,
    tap group). The extraction follows `gather_taps_xwin`'s measured-good
    pattern (contiguous channel slices + unrolled where-adds — NOT the
    broadcast-select form whose layout copies sank the quad variant).
    Equal to the plain 27-row gather wherever `pick < 4`; overflow taps
    read zero and are restored by the correction list."""
    r, pick = plan
    B, Vin, C = feats.shape
    G2, G = r.shape[1], r.shape[2]
    zero1 = jnp.zeros((B, 1, C), feats.dtype)
    zero4 = jnp.zeros((B, 4, C), feats.dtype)
    P = jnp.concatenate([zero1, feats, zero4], axis=1)     # (B, Vin+5, C)
    # x4[r] = [feats[r-1], ..., feats[r+2]]; row Vin+1 is all-zero
    x4 = jnp.concatenate([P[:, k:k + Vin + 2] for k in range(4)], axis=-1)
    boff = (jnp.arange(B, dtype=r.dtype) * (Vin + 2))[:, None, None]
    g = x4.reshape(B * (Vin + 2), 4 * C)[(r + boff).reshape(-1)]
    g = g.reshape(B, G2, G, 4 * C)
    w = tuple(g[..., o * C:(o + 1) * C] for o in range(4))
    sites = []
    for s in range(2):
        taps = []
        for t in range(3):
            pt = pick[:, :, s, :, t]                       # (B, G2, G)
            acc = jnp.where((pt == 0)[..., None], w[0], 0.0) \
                + jnp.where((pt == 1)[..., None], w[1], 0.0) \
                + jnp.where((pt == 2)[..., None], w[2], 0.0) \
                + jnp.where((pt == 3)[..., None], w[3], 0.0)
            taps.append(acc)
        sites.append(jnp.stack(taps, axis=3))              # (B, G2, G, 3, C)
    out = jnp.stack(sites, axis=2)                         # (B, G2, 2, G, 3, C)
    return out.reshape(B, G2 * 2, G * 3 * C)


def qwin_corrections(x, feats, kernel, corr, dtype):
    """Re-add the overflow taps dropped by the quad-window gather: one
    narrow row gather + 27 tap-masked (E, C) @ (C, Cout) matmuls + one
    scatter-add. Exactly reproduces `gathered[tap] @ W[tap]` for each
    host-enumerated (out_slot, tap, in_slot) entry; pad entries read the
    zero row and add zero to row 0."""
    qcin, qcout, qctap = corr                              # (B, E) each
    B, Vin, C = feats.shape
    E = qcin.shape[1]
    Vout, F = x.shape[1], x.shape[2]
    table = jnp.concatenate(
        [feats, jnp.zeros((B, 1, C), feats.dtype)], axis=1)
    bin_ = (jnp.arange(B, dtype=qcin.dtype) * (Vin + 1))[:, None]
    rows = table.reshape(B * (Vin + 1), C)[(qcin + bin_).reshape(-1)]
    rows = rows.reshape(B, E, C).astype(dtype)
    w3 = kernel.reshape(27, C, F).astype(dtype)
    contrib = jnp.zeros((B, E, F), jnp.float32)
    for k in range(27):
        masked = jnp.where((qctap == k)[..., None], rows, 0.0)
        contrib = contrib + jax.lax.dot_general(
            masked, w3[k], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    bout = (jnp.arange(B, dtype=qcout.dtype) * Vout)[:, None]
    flat = x.reshape(B * Vout, F).at[(qcout + bout).reshape(-1)].add(
        contrib.reshape(-1, F).astype(x.dtype))
    return flat.reshape(B, Vout, F)


def _gather_any(feats, plan):
    """Dispatch a gather by plan shape: xwin `(j, pick)` tuple or plain
    `(B, V, K)` neighbor table."""
    if isinstance(plan, tuple):
        return gather_taps_xwin(feats, plan)
    return gather_taps(feats, plan)


def _float0_like(tree):
    """Zero cotangents for integer-valued plan pytrees (JAX requires
    `float0` tangents for integer primals)."""
    import numpy as np
    return jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), tree)


@jax.custom_vjp
def sparse_conv_mm(feats, kernel, fplan, bplan):
    """Fused sparse conv `gather(feats, fplan) @ kernel` whose BACKWARD is
    itself one gather + two matmuls, via the transpose kernel map `bplan`.

    The reference's spconv backward scatters gradients through the rulebook
    on GPU (`spconv` autograd); XLA's autodiff of our gather formulation
    would emit serial scatter-adds AND save the gathered `(B, V, K*C)`
    tensor as a residual for dW — both backward killers on TPU (measured
    3.3x the forward, round-3 BENCH_NOTES). Instead, the transpose of a
    sparse conv's kernel map is itself a kernel map with the taps flipped:

      * submanifold k3p1: `nbr[v, k] == u  <=>  nbr[u, K-1-k] == v`
        (offsets are symmetric), so `bplan` is the SAME map/plan;
      * strided convs: `bplan` is the host-inverted down map
        (`ops/sparse_maps.invert_down_map` — already flip-stored).

    With `h[u, k'] = dy[bplan[u, k']]` (one gather of dy):
      d_feats[u] = sum_k' h[u, k'] @ W[K-1-k']^T          (one matmul)
      dW[K-1-k'] = sum_u feats[u]^T h[u, k']              (one matmul)
    and the only residuals are the layer INPUT table and the int plans —
    no `(B, V, K*C)` residual, no scatter, batch-size-8 fits in HBM.
    Exact up to float addition order (tests/test_sparse_backbone.py).
    """
    g = _gather_any(feats, fplan)
    return jax.lax.dot_general(g, kernel, (((2,), (0,)), ((), ())))


def _scm_fwd(feats, kernel, fplan, bplan):
    return sparse_conv_mm(feats, kernel, fplan, bplan), \
        (feats, kernel, fplan, bplan)


def _scm_bwd(res, dy):
    feats, kernel, fplan, bplan = res
    C = feats.shape[-1]
    F = dy.shape[-1]
    K = kernel.shape[0] // C
    h = _gather_any(dy, bplan)                           # (B, Vin, K*F)
    W3 = kernel.reshape(K, C, F)
    Wt = jnp.flip(W3, 0).transpose(0, 2, 1).reshape(K * F, C)
    d_feats = jax.lax.dot_general(h, Wt.astype(h.dtype),
                                  (((2,), (0,)), ((), ())))
    dWt = jax.lax.dot_general(feats, h, (((0, 1), (0, 1)), ((), ())),
                              preferred_element_type=jnp.float32)  # (C, K*F)
    dW = jnp.flip(dWt.reshape(C, K, F).transpose(1, 0, 2), 0) \
        .reshape(K * C, F)
    return (d_feats.astype(feats.dtype), dW.astype(kernel.dtype),
            _float0_like(fplan), _float0_like(bplan))


sparse_conv_mm.defvjp(_scm_fwd, _scm_bwd)


class SparseConvBNReLU(nn.Module):
    """One sparse conv layer (submanifold when `nbr` maps a stage onto
    itself; strided when it maps onto the previous stage's slots).

    `barrier` wraps the layer output in `lax.optimization_barrier`: the
    ladder is 11 gather+select+matmul layers, and letting XLA fuse across
    layer boundaries at production shapes blows up compile time (round-3
    xwin pathology); the barrier pins each layer as its own fusion island.
    """
    features: int
    use_relu: bool = True
    use_bn: bool = True
    barrier: bool = False
    table_dtype: Any = None          # e.g. jnp.bfloat16: gather half the
                                     # bytes (the ladder is gather-BW bound)

    @nn.compact
    def __call__(self, feats, nbr, out_mask, training: bool = False,
                 corr=None, bwd_nbr=None):
        qscale = None
        if str(self.table_dtype) == 'int8':
            # dynamic per-channel symmetric int8 slot tables: the ladder is
            # gather-bandwidth bound, so int8 rows halve the bf16 gather
            # bytes; the dequant scales fold into the matmul kernel (one
            # int8->bf16 cast after the gather, no extra multiply). Only the
            # pure-gather (eval / xwin) branch quantizes — the
            # gather-transpose training backward and qwin correction paths
            # fall back to bf16.
            qscale = jnp.max(jnp.abs(feats), axis=(0, 1)) / 127.0 + 1e-8
            if bwd_nbr is None and corr is None:
                feats = jnp.clip(jnp.round(feats / qscale),
                                 -127, 127).astype(jnp.int8)
            else:
                qscale = None
                feats = feats.astype(jnp.bfloat16)
            dt = jnp.bfloat16
        elif self.table_dtype is not None:
            feats = feats.astype(self.table_dtype)
            dt = self.table_dtype
        else:
            dt = jnp.float32
        if bwd_nbr is not None and corr is None \
                and not (isinstance(nbr, tuple) and nbr[1].ndim == 5):
            C = feats.shape[-1]
            K = (nbr.shape[-1] if not isinstance(nbr, tuple)
                 else nbr[1].shape[-2] * 3)
            kernel = self.param('kernel', nn.initializers.lecun_normal(),
                                (K * C, self.features))
            x = sparse_conv_mm(feats, kernel.astype(dt), nbr, bwd_nbr)
        else:
            if isinstance(nbr, tuple) and nbr[1].ndim == 5:
                if nbr[1].shape[2] == 2:                  # pwin_plan
                    x = gather_taps_pwin(feats, nbr)[:, :out_mask.shape[1]]
                else:                                     # qwin_plan
                    x = gather_taps_qwin(feats, nbr)[:, :out_mask.shape[1]]
            elif isinstance(nbr, tuple):                  # xwin_plan
                x = gather_taps_xwin(feats, nbr)
            else:
                x = gather_taps(feats, nbr)
            kernel = self.param('kernel', nn.initializers.lecun_normal(),
                                (x.shape[-1], self.features))
            k = kernel.astype(dt)
            if qscale is not None:
                # int8 rows -> bf16 once, with the per-channel dequant scale
                # folded into the kernel (taps are the outer axis of K*C)
                x = x.astype(dt)
                K_taps = x.shape[-1] // qscale.shape[0]
                k = k * jnp.tile(qscale, K_taps)[:, None].astype(dt)
            x = jax.lax.dot_general(x, k,
                                    (((2,), (0,)), ((), ())))
        if corr is not None:
            x = qwin_corrections(x, feats, kernel, corr, dt)
        if self.use_bn:
            x = MaskedBatchNorm()(x, out_mask, training)
        if self.use_relu:
            x = nn.relu(x)
        x = jnp.where(out_mask[..., None], x, 0.0)
        if self.barrier:
            x = jax.lax.optimization_barrier(x)
        return x


class SparseBasicBlock(nn.Module):
    """Residual block of two submanifold convs (`spconv_backbone.py:
    SparseBasicBlock:25-66`): conv-bn-relu, conv-bn, +identity, relu."""
    features: int
    barrier: bool = False
    table_dtype: object = None

    @nn.compact
    def __call__(self, feats, nbr, mask, training: bool = False, corr=None,
                 bwd_nbr=None):
        identity = feats
        x = SparseConvBNReLU(self.features, barrier=self.barrier,
                             table_dtype=self.table_dtype)(
            feats, nbr, mask, training, corr, bwd_nbr=bwd_nbr)
        x = SparseConvBNReLU(self.features, use_relu=False,
                             barrier=self.barrier,
                             table_dtype=self.table_dtype)(x, nbr, mask,
                                                           training, corr,
                                                           bwd_nbr=bwd_nbr)
        x = nn.relu(x + identity)
        return jnp.where(mask[..., None], x, 0.0)


class SparseVoxelBackBone8x(nn.Module):
    """Config: NUM_FILTERS (default [16, 32, 64, 64]), OUT_FEATURES (128),
    RESIDUAL (False -> plain blocks, True -> `VoxelResBackBone8x`).

    Consumes the host-precomputed ladder tables (`ops/sparse_maps.py`,
    added to the batch by the model's `host_prepare`):
      sp_coords{s}/sp_mask{s}/sp_submap{s} for s in 1..4,
      sp_downmap{s} for s in 2..4, sp_coords_out/sp_mask_out/sp_outmap.
    Adds: 'spatial_features' (stride-8 BEV, height-compressed),
    'multi_scale_3d_features_sparse' {x_conv1..4: (feats, coords, mask)}.
    """
    model_cfg: Any
    input_channels: int
    grid_size: Any                 # (W, H, D)
    residual: bool = False         # VoxelResBackBone8x variant

    def _shapes(self):
        return ladder_shapes(self.grid_size)

    @property
    def num_bev_features(self):
        cfg = as_cfg(self.model_cfg)
        return cfg.get('OUT_FEATURES', 128) * self._shapes()[4][0]

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        filters = cfg.get('NUM_FILTERS', [16, 32, 64, 64])
        out_ch = cfg.get('OUT_FEATURES', 128)
        residual = cfg.get('RESIDUAL', self.residual)
        # window-fetch gathers (all exact):
        #   XWIN — 9 rows of 3C per site (3x fewer gathered rows);
        #   QWIN — 9 rows of 6C per 4-site group (2x fewer gathered bytes
        #   than xwin; measured LOSES to xwin, kept for the record);
        #   PWIN — 9 rows of 4C per 2-site pair (2x fewer gathered rows
        #   than xwin at xwin-style extraction cost).
        # QWIN/PWIN need the host-built overflow-correction lists
        # (`ops/sparse_maps.{qwin,pwin}_corr_buckets`; the *_qcin/_qcout/
        # _qctap batch keys from host_prepare).
        xwin = cfg.get('XWIN', False)
        qwin = cfg.get('QWIN', False) and 'sp_submap1_qcin' in batch
        pwin = (not qwin and cfg.get('PWIN', False)
                and 'sp_submap1_qcin' in batch)
        barrier = cfg.get('LAYER_BARRIER', xwin or qwin or pwin)
        tdt = {'bf16': jnp.bfloat16, 'bfloat16': jnp.bfloat16,
               'int8': 'int8'}.get(str(cfg.get('TABLE_DTYPE', '')).lower())
        # gather-transpose backward (`sparse_conv_mm`): on whenever training
        # and the host shipped the inverse down maps (sp_upmap*); submanifold
        # maps are their own transpose so they need no extra tables.
        gbwd = (training and cfg.get('GATHER_BWD', True)
                and not (qwin or pwin) and 'sp_upmap2' in batch)
        feats = batch['voxel_features']                  # (B, cap1, Cin)
        ms = {}

        def make_plan(key, nbr, cap_in):
            if qwin or pwin:
                corr = (batch[f'{key}_qcin'], batch[f'{key}_qcout'],
                        batch[f'{key}_qctap'])
                plan_fn = qwin_plan if qwin else pwin_plan
                return plan_fn(nbr, cap_in), corr
            if xwin:
                return xwin_plan(nbr, cap_in), None
            return nbr, None

        def up_plan(key, cap_dy):
            """Backward plan: gather of dy rows through the inverted down
            map (plain for conv_out's non-x-adjacent z taps)."""
            if not gbwd:
                return None
            up = batch[key]
            if xwin and up.shape[-1] == 27:
                return xwin_plan(up, cap_dy)
            return up

        def stage_blocks(x, nbr, mask, ch, n_sub, name, corr, bwd):
            for i in range(n_sub):
                if residual:
                    x = SparseBasicBlock(ch, barrier=barrier,
                                         table_dtype=tdt,
                                         name=f'{name}_block{i}')(
                        x, nbr, mask, training, corr, bwd_nbr=bwd)
                else:
                    x = SparseConvBNReLU(ch, barrier=barrier,
                                         table_dtype=tdt,
                                         name=f'{name}_subm{i}')(
                        x, nbr, mask, training, corr, bwd_nbr=bwd)
            return x

        # reorder input voxel features into sorted-slot order
        feats = jax.vmap(lambda f, p: f[p])(feats, batch['sp_perm1'])

        # conv_input + conv1 (stage 1, submanifold only). A subm map is its
        # own transpose (tap-flipped), so the backward plan IS the forward
        # plan — `sparse_conv_mm` flips the weight blocks.
        m1 = batch['sp_mask1']
        n1, c1 = make_plan('sp_submap1', batch['sp_submap1'], feats.shape[1])
        b1 = n1 if gbwd else None
        x = SparseConvBNReLU(filters[0], barrier=barrier, table_dtype=tdt,
                             name='conv_input')(
            jnp.where(m1[..., None], feats, 0.0), n1, m1, training, c1,
            bwd_nbr=b1)
        n_sub1 = 2 if residual else 1
        x = stage_blocks(x, n1, m1, filters[0], n_sub1, 'conv1', c1, b1)
        ms['x_conv1'] = (x, batch['sp_coords1'], m1, 1)

        # stages 2-4: strided down conv + submanifold blocks
        for s, ch in zip((2, 3, 4), filters[1:]):
            mask_s = batch[f'sp_mask{s}']
            prev_cap = x.shape[1]
            down, cd = make_plan(f'sp_downmap{s}', batch[f'sp_downmap{s}'],
                                 prev_cap)
            sub, cs = make_plan(f'sp_submap{s}', batch[f'sp_submap{s}'],
                                mask_s.shape[1])
            bdown = up_plan(f'sp_upmap{s}', mask_s.shape[1])
            bsub = sub if gbwd else None
            x = SparseConvBNReLU(ch, barrier=barrier, table_dtype=tdt,
                                 name=f'down{s}')(
                x, down, mask_s, training, cd, bwd_nbr=bdown)
            x = stage_blocks(x, sub, mask_s, ch, 2, f'conv{s}', cs, bsub)
            ms[f'x_conv{s}'] = (x, batch[f'sp_coords{s}'], mask_s, 2 ** (s - 1))

        # conv_out: z-stride (3,1,1)/(2,1,1) down conv; its 3 z-taps are not
        # x-adjacent, so both directions use the plain gather.
        mo = batch['sp_mask_out']
        bout = batch.get('sp_upmap_out') if gbwd else None
        x = SparseConvBNReLU(out_ch, barrier=barrier, table_dtype=tdt,
                             name='conv_out')(
            x, batch['sp_outmap'], mo, training, bwd_nbr=bout)

        # scatter the final actives to the dense stride-8 BEV canvas and
        # height-compress (reference `HeightCompression`: z folds into C)
        Dz, Hy, Wx = self._shapes()[4]
        co = batch['sp_coords_out'].astype(jnp.int32)    # (B, Vo, 3) zyx
        ncell = Dz * Hy * Wx
        flat = (co[..., 0] * Hy + co[..., 1]) * Wx + co[..., 2]
        flat = jnp.where(mo, flat, ncell)
        B = flat.shape[0]
        # flat-batch scatter (batched scatter hits the same slow XLA
        # lowering as batched gather; see gather_taps)
        boff = (jnp.arange(B, dtype=flat.dtype) * (ncell + 1))[:, None]
        canvas = jnp.zeros((B * (ncell + 1), out_ch), x.dtype)
        dense = canvas.at[(flat + boff).reshape(-1)].add(
            x.reshape(-1, out_ch)).reshape(B, ncell + 1, out_ch)[:, :ncell]
        dense = dense.reshape(-1, Dz, Hy, Wx, out_ch)
        batch['multi_scale_3d_features_sparse'] = ms
        batch['encoded_sparse_out'] = (x, co, mo)
        batch['spatial_features'] = jnp.moveaxis(dense, 1, 3).reshape(
            dense.shape[0], Hy, Wx, Dz * out_ch)
        batch['spatial_features_stride'] = 8
        return batch


class SparseUNetV2(nn.Module):
    """Sparse UNet backbone for point-wise feature learning (Part-A2) —
    the TPU-native re-design of `pcdet/models/backbones_3d/spconv_unet.py:
    UNetV2:49-230`: the VoxelBackBone8x encoder ladder (same host kernel
    maps) plus the UR-block decoder, where spconv's `SparseInverseConv3d`
    (transposed rulebook via indice_key reuse, `spconv_unet.py:114`)
    becomes one gather+matmul over the host-inverted down map
    (`ops/sparse_maps.invert_down_map`) — same fixed-shape machinery as
    every other layer of the ladder.

    UR block (`UR_block_forward`, reference :135-144):
        t = SparseBasicBlock(lateral)            # conv_up_t, subm
        cat = [bottom, t]                        # 2C channels
        m = SubmConvBNReLU(cat) -> C             # conv_up_m
        red = cat.view(N, C, 2).sum(-1)          # channel_reduction :146-161
        x = inv_conv(m + red) -> finer stage     # inv_conv / conv5

    Consumes the ladder tables plus sp_upmap{2,3,4} (host_prepare adds
    them for this backbone). Adds to batch: 'spatial_features' (stride-8
    BEV from conv_out), 'point_features' (B, cap1, C0) at the stage-1
    slots, 'point_coords' (voxel centers), 'point_mask'.
    """
    model_cfg: Any
    input_channels: int
    grid_size: Any                 # (W, H, D)
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)

    def _shapes(self):
        return ladder_shapes(self.grid_size)

    @property
    def num_bev_features(self):
        cfg = as_cfg(self.model_cfg)
        return cfg.get('OUT_FEATURES', 128) * self._shapes()[4][0]

    @property
    def num_point_features(self):
        return as_cfg(self.model_cfg).get('NUM_FILTERS',
                                          [16, 32, 64, 64])[0]

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        filters = cfg.get('NUM_FILTERS', [16, 32, 64, 64])
        out_ch = cfg.get('OUT_FEATURES', 128)
        xwin = cfg.get('XWIN', False)
        barrier = cfg.get('LAYER_BARRIER', xwin)
        tdt = {'bf16': jnp.bfloat16, 'bfloat16': jnp.bfloat16,
               'int8': 'int8'}.get(str(cfg.get('TABLE_DTYPE', '')).lower())
        # gather-transpose backward (see SparseVoxelBackBone8x): subm maps
        # are self-transpose; down<->up maps are each other's transpose, and
        # both directions are already in the batch for the UNet. conv_out
        # additionally needs sp_upmap_out (training host_prepare).
        gbwd = (training and cfg.get('GATHER_BWD', True)
                and 'sp_upmap_out' in batch)

        def plan(nbr, cap_in):
            return xwin_plan(nbr, cap_in) if xwin else nbr

        def conv(x, nbr, mask, ch, name, relu=True, bwd=None):
            return SparseConvBNReLU(ch, use_relu=relu, barrier=barrier,
                                    table_dtype=tdt, name=name)(
                x, nbr, mask, training, bwd_nbr=bwd if gbwd else None)

        feats = batch['voxel_features']
        feats = jax.vmap(lambda f, p: f[p])(feats, batch['sp_perm1'])

        m = {s: batch[f'sp_mask{s}'] for s in (1, 2, 3, 4)}
        sub = {1: plan(batch['sp_submap1'], feats.shape[1])}
        enc = {}

        # encoder (identical structure to SparseVoxelBackBone8x /
        # reference UNetV2 conv_input..conv4)
        x = conv(jnp.where(m[1][..., None], feats, 0.0), sub[1], m[1],
                 filters[0], 'conv_input', bwd=sub[1])
        x = conv(x, sub[1], m[1], filters[0], 'conv1_subm0', bwd=sub[1])
        enc[1] = x
        downs, ups = {}, {}
        for s, ch in zip((2, 3, 4), filters[1:]):
            downs[s] = plan(batch[f'sp_downmap{s}'], x.shape[1])
            ups[s] = plan(batch[f'sp_upmap{s}'], m[s].shape[1]) \
                if f'sp_upmap{s}' in batch else None
            sub[s] = plan(batch[f'sp_submap{s}'], m[s].shape[1])
            x = conv(x, downs[s], m[s], ch, f'down{s}', bwd=ups[s])
            x = conv(x, sub[s], m[s], ch, f'conv{s}_subm0', bwd=sub[s])
            x = conv(x, sub[s], m[s], ch, f'conv{s}_subm1', bwd=sub[s])
            enc[s] = x

        # conv_out -> stride-8 BEV (detection branch, as the 8x ladder);
        # its z-taps are not x-adjacent: plain gather both directions
        mo = batch['sp_mask_out']
        xo = conv(x, batch['sp_outmap'], mo, out_ch, 'conv_out',
                  bwd=batch.get('sp_upmap_out'))
        Dz, Hy, Wx = self._shapes()[4]
        co = batch['sp_coords_out'].astype(jnp.int32)
        ncell = Dz * Hy * Wx
        flat = jnp.where(mo, (co[..., 0] * Hy + co[..., 1]) * Wx
                         + co[..., 2], ncell)
        B = flat.shape[0]
        boff = (jnp.arange(B, dtype=flat.dtype) * (ncell + 1))[:, None]
        canvas = jnp.zeros((B * (ncell + 1), out_ch), xo.dtype)
        dense = canvas.at[(flat + boff).reshape(-1)].add(
            xo.reshape(-1, out_ch)).reshape(B, ncell + 1, out_ch)[:, :ncell]
        dense = dense.reshape(-1, Dz, Hy, Wx, out_ch)
        batch['spatial_features'] = jnp.moveaxis(dense, 1, 3).reshape(
            dense.shape[0], Hy, Wx, Dz * out_ch)
        batch['spatial_features_stride'] = 8

        # decoder: UR blocks 4 -> 1 (reference forward :199-207). The
        # inverse conv's forward map is the upmap, so its transpose (the
        # backward plan) is the DOWN map — both already on device.
        def ur(lateral, bottom, s, ch, ch_out, up_nbr, up_mask, name,
               inv_bwd):
            t = SparseBasicBlock(ch, barrier=barrier, table_dtype=tdt,
                                 name=f'{name}_t')(
                lateral, sub[s], m[s], training,
                bwd_nbr=sub[s] if gbwd else None)
            cat = jnp.concatenate([bottom, t], axis=-1)          # (B,V,2C)
            xm = conv(cat, sub[s], m[s], ch, f'{name}_m', bwd=sub[s])
            red = cat.reshape(*cat.shape[:-1], ch, 2).sum(-1)
            x = jnp.where(m[s][..., None], xm + red, 0.0)
            return conv(x, up_nbr, up_mask, ch_out, f'{name}_inv',
                        bwd=inv_bwd)

        x_up4 = ur(enc[4], enc[4], 4, filters[3], filters[2],
                   ups[4], m[3], 'up4', downs[4])
        x_up3 = ur(enc[3], x_up4, 3, filters[2], filters[1],
                   ups[3], m[2], 'up3', downs[3])
        x_up2 = ur(enc[2], x_up3, 2, filters[1], filters[0],
                   ups[2], m[1], 'up2', downs[2])
        # UR1's "inverse" slot is the plain subm conv5 (reference :130,207)
        x_up1 = ur(enc[1], x_up2, 1, filters[0], filters[0],
                   sub[1], m[1], 'up1', sub[1])

        # per-voxel point features at the stage-1 slots (= input voxels in
        # sorted-slot order), reference forward :210-216
        c1 = batch['sp_coords1'].astype(jnp.float32)             # zyx
        vsz = jnp.asarray(self.voxel_size, jnp.float32)
        org = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        centers = jnp.stack([(c1[..., 2] + 0.5) * vsz[0] + org[0],
                             (c1[..., 1] + 0.5) * vsz[1] + org[1],
                             (c1[..., 0] + 0.5) * vsz[2] + org[2]], -1)
        batch['point_features'] = x_up1.astype(jnp.float32)
        batch['point_coords'] = centers
        batch['point_mask'] = m[1]
        return batch
