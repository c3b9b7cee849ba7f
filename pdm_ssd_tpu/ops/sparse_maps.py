"""Host-side kernel-map builder for the TPU-native sparse voxel backbone.

The reference's spconv layer (`pcdet/models/backbones_3d/spconv_backbone.py:
70-180`) builds rulebooks (input->output index pairs per kernel tap) on the
GPU at every forward. On TPU the right split is different: neighbor indices
depend only on voxel *coordinates*, which are produced on the host by the
voxelizer — so the whole ladder's kernel maps are precomputed here in
vectorized numpy (sorted flat keys + `np.searchsorted`), once per sample,
and shipped to the device as fixed-capacity int32 gather tables. The device
graph is then pure gather + matmul (MXU) with zero dynamic shapes.

Conventions:
- coords are (V, 3) int32 **zyx** (spconv layout), sorted by flat key
  `(z*H + y)*W + x`; invalid slots padded at the end.
- every map entry indexes a slot in the producing stage's table, with the
  one-past-the-end slot `cap` used as "absent neighbor" (the device pads the
  feature table with a zero row at index `cap`).
- active-site semantics match spconv exactly:
  * SubMConv3d k3 p1: outputs at the input sites; tap (kz,ky,kx) reads the
    neighbor at coord + (kz-1, ky-1, kx-1).
  * SparseConv3d k s p: output site `o` is active iff any input lies in its
    receptive field `o*s - p + k, k in [0,K)`; out dims are the standard
    conv formula. (`spconv2` blocks: k3 s2 p1; `spconv4`: z-pad 0;
    `conv_out`: k(3,1,1) s(2,1,1) p0.)
- the input sparse z extent is `D + 1` exactly as the reference's
  `sparse_shape = grid_size[::-1] + [1, 0, 0]`.
"""
from __future__ import annotations

import numpy as np

__all__ = ['build_backbone8x_maps', 'batch_build_backbone8x',
           'ladder_shapes', 'LADDER_KEYS', 'qwin_corr_buckets',
           'QWIN_MAP_NAMES', 'qwin_keys']


def _flat(coords, dims):
    """(V, 3) zyx -> flat key under dims (D, H, W)."""
    _, H, W = dims
    return (coords[:, 0].astype(np.int64) * H + coords[:, 1]) * W + coords[:, 2]


def _lookup(sorted_keys, n_valid, queries):
    """Indices into the sorted key array for each query, or `len(sorted_keys)`
    (the pad slot) when absent. `sorted_keys[n_valid:]` is padding."""
    cap = len(sorted_keys)
    if n_valid <= 0:
        return np.full(queries.shape, cap, np.int32)
    keys = sorted_keys[:n_valid]
    pos = np.searchsorted(keys, queries)
    pos_c = np.minimum(pos, n_valid - 1)
    hit = keys[pos_c] == queries
    return np.where(hit, pos_c, cap).astype(np.int32)


def _subm_map(coords, n_valid, dims, ksize):
    """(cap, K) neighbor slots for a submanifold conv at the given sites."""
    cap = len(coords)
    kz, ky, kx = ksize
    offs = np.stack(np.meshgrid(
        np.arange(kz) - kz // 2, np.arange(ky) - ky // 2,
        np.arange(kx) - kx // 2, indexing='ij'), -1).reshape(-1, 3)
    K = len(offs)
    nbr = coords[:, None, :] + offs[None, :, :]              # (cap, K, 3)
    ok = np.all((nbr >= 0) & (nbr < np.asarray(dims)), axis=-1)
    ok[n_valid:] = False
    q = _flat(nbr.reshape(-1, 3), dims)
    sk = _flat(coords, dims)
    out = _lookup(sk, n_valid, q).reshape(cap, K)
    return np.where(ok, out, cap).astype(np.int32)


def _down_sites(coords, n_valid, dims, ksize, stride, pad, cap_out):
    """Active output sites of a strided sparse conv: union over inputs of all
    output cells whose receptive field covers them. Returns (coords_out
    (cap_out,3) sorted by flat key, n_out, dims_out)."""
    dims_out = tuple((d + 2 * p - k) // s + 1
                     for d, k, s, p in zip(dims, ksize, stride, pad))
    c = coords[:n_valid]
    cand = None
    # per-axis candidate outputs: o = (i + p - k)/s for each tap k
    per_axis = []
    for ax, (k, s, p) in enumerate(zip(ksize, stride, pad)):
        num = c[:, ax:ax + 1] + p - np.arange(k)[None, :]    # (n, k)
        ok = (num % s == 0) & (num >= 0)
        o = num // s
        ok &= o < dims_out[ax]
        per_axis.append((o, ok))
    oz, okz = per_axis[0]
    oy, oky = per_axis[1]
    ox, okx = per_axis[2]
    # cross product of per-axis candidates (K = kz*ky*kx combos)
    z = oz[:, :, None, None]
    y = oy[:, None, :, None]
    x = ox[:, None, None, :]
    ok = okz[:, :, None, None] & oky[:, None, :, None] & okx[:, None, None, :]
    flat = (z.astype(np.int64) * dims_out[1] + y) * dims_out[2] + x
    flat = flat[ok]
    uniq = np.unique(flat)
    n_out = min(len(uniq), cap_out)
    out = np.zeros((cap_out, 3), np.int32)
    u = uniq[:n_out]
    out[:n_out, 2] = u % dims_out[2]
    out[:n_out, 1] = (u // dims_out[2]) % dims_out[1]
    out[:n_out, 0] = u // (dims_out[2] * dims_out[1])
    return out, n_out, dims_out


def _down_map(coords_in, n_in, dims_in, coords_out, n_out, ksize, stride, pad):
    """(cap_out, K) input slots read by each output site of a strided conv."""
    cap_out = len(coords_out)
    cap_in = len(coords_in)
    taps = np.stack(np.meshgrid(*[np.arange(k) for k in ksize],
                                indexing='ij'), -1).reshape(-1, 3)
    K = len(taps)
    s = np.asarray(stride)
    p = np.asarray(pad)
    src = coords_out[:, None, :] * s[None, None, :] - p[None, None, :] \
        + taps[None, :, :]                                   # (cap_out, K, 3)
    ok = np.all((src >= 0) & (src < np.asarray(dims_in)), axis=-1)
    ok[n_out:] = False
    q = _flat(src.reshape(-1, 3), dims_in)
    sk = _flat(coords_in, dims_in)
    out = _lookup(sk, n_in, q).reshape(cap_out, K)
    return np.where(ok, out, cap_in).astype(np.int32)


# stage spec of VoxelBackBone8x: (ksize, stride, pad) of each downsample
_DOWN_SPECS = [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),   # conv2  ('spconv2')
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),   # conv3  ('spconv3')
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),   # conv4  ('spconv4', z-pad 0)
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),   # conv_out ('spconv_down2')
]

LADDER_KEYS = (
    ['sp_perm1', 'sp_coords1', 'sp_mask1', 'sp_submap1']
    + sum([[f'sp_coords{s}', f'sp_mask{s}', f'sp_downmap{s}', f'sp_submap{s}']
           for s in (2, 3, 4)], [])
    + ['sp_coords_out', 'sp_mask_out', 'sp_outmap']
)


def ladder_shapes(grid_size_whd):
    """Per-stage (D, H, W) dims of the ladder, input z extended by +1
    (reference `sparse_shape = grid_size[::-1] + [1, 0, 0]`)."""
    W, H, D = (int(v) for v in grid_size_whd)
    dims = [(D + 1, H, W)]
    for ks, st, pd in _DOWN_SPECS:
        d = dims[-1]
        dims.append(tuple((dd + 2 * p - k) // s + 1
                          for dd, k, s, p in zip(d, ks, st, pd)))
    return dims   # [stage1, stage2, stage3, stage4, out]


def build_backbone8x_maps(coords, n_valid, grid_size_whd, caps):
    """One sample. coords: (cap1, 3) int32 zyx sorted by flat key (the
    voxelizer contract), valid prefix length `n_valid`. caps: per-stage slot
    capacities [cap1, cap2, cap3, cap4, cap_out]. Returns the LADDER_KEYS
    dict of numpy arrays."""
    dims = ladder_shapes(grid_size_whd)
    try:
        from ..csrc import build_ladder_maps as native
        out = native(np.asarray(coords, np.int32), int(n_valid),
                     np.asarray(dims[0], np.int32), caps)
        if out is not None:
            return out
    except Exception:
        pass
    cap1 = caps[0]
    n1 = min(int(n_valid), cap1)
    # stage-1 slots are the input voxels sorted by flat key (the searchsorted
    # invariant); sp_perm1 reorders the device-side feature table to match
    # (identity when the voxelizer already emits sorted coords)
    keys_in = _flat(coords[:n1].astype(np.int32), dims[0])
    order = np.argsort(keys_in, kind='stable').astype(np.int32)
    c1 = np.zeros((cap1, 3), np.int32)
    c1[:n1] = coords[:n1][order]
    perm = np.zeros((cap1,), np.int32)
    perm[:n1] = order
    out = {
        'sp_perm1': perm,
        'sp_coords1': c1,
        'sp_mask1': (np.arange(cap1) < n1),
        'sp_submap1': _subm_map(c1, n1, dims[0], (3, 3, 3)),
    }
    prev_c, prev_n, prev_dims = c1, n1, dims[0]
    for si, (spec, cap) in enumerate(zip(_DOWN_SPECS[:3], caps[1:4])):
        s = si + 2
        ks, st, pd = spec
        c, n, d = _down_sites(prev_c, prev_n, prev_dims, ks, st, pd, cap)
        out[f'sp_coords{s}'] = c
        out[f'sp_mask{s}'] = (np.arange(cap) < n)
        out[f'sp_downmap{s}'] = _down_map(prev_c, prev_n, prev_dims, c, n,
                                          ks, st, pd)
        out[f'sp_submap{s}'] = _subm_map(c, n, d, (3, 3, 3))
        prev_c, prev_n, prev_dims = c, n, d
    ks, st, pd = _DOWN_SPECS[3]
    co, no, do = _down_sites(prev_c, prev_n, prev_dims, ks, st, pd, caps[4])
    out['sp_coords_out'] = co
    out['sp_mask_out'] = (np.arange(caps[4]) < no)
    out['sp_outmap'] = _down_map(prev_c, prev_n, prev_dims, co, no, ks, st, pd)
    return out


def batch_build_backbone8x(voxel_coords, voxel_mask, grid_size_whd, caps,
                           qwin_corr_cap=None, pwin_corr_cap=None,
                           want_upmaps=False):
    """Stack `build_backbone8x_maps` over the batch dim.
    voxel_coords: (B, V, 3) zyx; voxel_mask: (B, V) bool.
    `qwin_corr_cap` / `pwin_corr_cap`: per-tap correction-bucket capacity
    (int or {map_name: int}) — adds the packed-window correction keys (see
    `qwin_corr_buckets`) needed when BACKBONE_3D.QWIN / PWIN is on (the
    two share the batch-key naming; at most one applies per model).
    `want_upmaps` adds the four transpose maps (UPMAP_KEYS) — inverted in
    C on the native path, numpy otherwise."""
    out = None
    try:
        from ..csrc import batch_build_ladder_maps as native_batch
        out = native_batch(np.asarray(voxel_coords), np.asarray(voxel_mask),
                           np.asarray(ladder_shapes(grid_size_whd)[0],
                                      np.int32), caps,
                           want_upmaps=want_upmaps)
    except Exception:
        out = None
    if out is None:
        per = [build_backbone8x_maps(np.asarray(voxel_coords[b]),
                                     int(np.sum(voxel_mask[b])),
                                     grid_size_whd, caps)
               for b in range(len(voxel_coords))]
        out = {k: np.stack([p[k] for p in per]) for k in LADDER_KEYS}
        if want_upmaps:
            out.update(batch_invert_ladder(out, caps))
    if qwin_corr_cap is not None:
        out.update(batch_qwin_corrections(out, caps, qwin_corr_cap))
    elif pwin_corr_cap is not None:
        out.update(batch_pwin_corrections(out, caps, pwin_corr_cap))
    return out


def invert_down_map(downmap, cap_in):
    """Transposed rulebook of a strided conv — the host analog of spconv's
    `SparseInverseConv3d` reusing the down conv's indice_key
    (`pcdet/models/backbones_3d/spconv_unet.py:114` `conv_type='inverseconv'`):
    up[j, K-1-k] = i iff downmap[i, k] == j, i.e. fine slot j receives the
    coarse slot i that consumed it at tap k, stored at the FLIPPED tap
    index (transposed convs use the flipped kernel — and, operationally,
    flipping restores increasing-slot order within each x-tap group, which
    `xwin_plan`'s window fetch requires: i's cell = (j_cell + pad - tap_k)
    / stride DEcreases with tap_k). The (j, k) -> i assignment is unique
    by geometry. downmap: (cap_out, K) int32 with pad = cap_in; returns
    (cap_in, K) int32 with pad = cap_out — the same layout every
    `gather_taps` / `xwin_plan` consumer already understands."""
    cap_out, K = downmap.shape
    up = np.full((cap_in + 1, K), cap_out, np.int32)
    ii, kk = np.nonzero(downmap < cap_in)
    up[downmap[ii, kk], K - 1 - kk] = ii.astype(np.int32)
    return up[:cap_in]


def batch_invert_down_maps(maps, caps):
    """sp_upmap{2,3,4} for the UNet decoder, from the batched ladder maps."""
    out = {}
    for s, cap_in in zip((2, 3, 4), caps[:3]):
        dm = maps[f'sp_downmap{s}']
        out[f'sp_upmap{s}'] = np.stack(
            [invert_down_map(dm[b], cap_in) for b in range(len(dm))])
    return out


UPMAP_KEYS = ['sp_upmap2', 'sp_upmap3', 'sp_upmap4', 'sp_upmap_out']


def batch_invert_ladder(maps, caps):
    """All four transpose maps of the 8x ladder (sp_upmap{2,3,4} +
    sp_upmap_out) — consumed by the gather-transpose training backward
    (`sparse_backbone.sparse_conv_mm`); the UNet decoder uses the first
    three as its inverse-conv forward maps."""
    out = batch_invert_down_maps(maps, caps)
    om = maps['sp_outmap']
    out['sp_upmap_out'] = np.stack(
        [invert_down_map(om[b], caps[3]) for b in range(len(om))])
    return out


# ---- quad-window correction buckets ----------------------------------------
#
# The device-side quad-window gather (`sparse_backbone.qwin_plan` /
# `gather_taps_qwin`) packs each group of 4 consecutive output slots x each
# (dz, dy) tap group into ONE fetched 6-slot window based at
# j = min(present tap slots); taps whose slot offset exceeds 5 overflow the
# window and are zeroed in the main path. These helpers enumerate exactly
# those (output slot, tap, input slot) triples on the host and bucket them
# per tap, so the device can re-add their contribution with one narrow
# gather + one (27, n, C) x (27, C, Cout) matmul + one scatter-add — keeping
# the quad-window conv EXACT. Measured on 0.05 m KITTI-scale clouds the
# overflow is 0.1-7% of windows (BENCH_NOTES round 3), so buckets are small.

# maps eligible for the quad-window fetch (27-tap convs; conv_out's
# k(3,1,1) taps are not x-adjacent and stays on the plain gather)
QWIN_MAP_NAMES = ('sp_submap1', 'sp_downmap2', 'sp_submap2', 'sp_downmap3',
                  'sp_submap3', 'sp_downmap4', 'sp_submap4')

# input-table capacity index (into `caps`) for each quad-window map
_QWIN_CAP_IN = {'sp_submap1': 0, 'sp_downmap2': 0, 'sp_submap2': 1,
                'sp_downmap3': 1, 'sp_submap3': 2, 'sp_downmap4': 2,
                'sp_submap4': 3}


# default flat correction-list capacities, ~4x the counts measured on
# production-density 0.05 m clouds (B=2, 16k voxels); override via
# BACKBONE_3D.QWIN_CORR_CAP (int or per-map dict)
QWIN_CORR_CAP_DEFAULT = {
    'sp_submap1': 512, 'sp_downmap2': 2048, 'sp_submap2': 12288,
    'sp_downmap3': 2048, 'sp_submap3': 24576, 'sp_downmap4': 16384,
    'sp_submap4': 4096,
}


def qwin_keys(names=QWIN_MAP_NAMES):
    return sum([[f'{n}_qcin', f'{n}_qcout', f'{n}_qctap'] for n in names], [])


def win_overflow_entries(nbr, cap_in, group, maxoff):
    """Overflow triples of one sample's 27-tap map under a packed-window
    plan (`group` consecutive output slots per window, taps with slot
    offset > `maxoff` overflow). nbr: (cap_out, 27) with cap_in = absent.
    Returns (out_slot (E,), tap (E,), in_slot (E,)) — must mirror the
    device plan's j = min-present choice exactly (qwin: group 4 / maxoff 5;
    pwin: group 2 / maxoff 3)."""
    cap_out, K = nbr.shape
    assert K == 27
    Vg = -(-cap_out // group) * group
    l = np.full((Vg, 27), cap_in, nbr.dtype)
    l[:cap_out] = nbr
    l = l.reshape(Vg // group, group, 9, 3)
    present = l < cap_in
    lm = np.where(present, l.astype(np.int64), np.iinfo(np.int64).max)
    j = lm.min(axis=(1, 3))                       # (Gg, 9)
    off = l - j[:, None, :, None]
    ovf = present & (off > maxoff)
    gg, site, grp, t = np.nonzero(ovf)
    out_slot = (gg * group + site).astype(np.int32)
    tap = (grp * 3 + t).astype(np.int32)
    in_slot = l[gg, site, grp, t].astype(np.int32)
    keep = out_slot < cap_out
    return out_slot[keep], tap[keep], in_slot[keep]


def qwin_overflow_entries(nbr, cap_in):
    return win_overflow_entries(nbr, cap_in, group=4, maxoff=5)


def pwin_overflow_entries(nbr, cap_in):
    return win_overflow_entries(nbr, cap_in, group=2, maxoff=3)


def qwin_corr_buckets(nbr, cap_in, capc, group=4, maxoff=5):
    """Flat fixed-capacity correction list for one map: returns (qcin
    (capc,) input slots, qcout (capc,) output slots, qctap (capc,) tap ids).
    Pad entries read the zero row (in = cap_in) and land on row 0 with an
    exactly-zero contribution. Entries beyond `capc` are dropped with the
    repo-wide cap-saturation convention (count available via
    `win_overflow_entries`). group/maxoff select the window variant
    (defaults: quad; pwin passes 2/3)."""
    out_slot, tap, in_slot = win_overflow_entries(nbr, cap_in, group, maxoff)
    n = min(len(out_slot), capc)
    qcin = np.full((capc,), cap_in, np.int32)
    qcout = np.zeros((capc,), np.int32)
    qctap = np.zeros((capc,), np.int32)
    qcin[:n] = in_slot[:n]
    qcout[:n] = out_slot[:n]
    qctap[:n] = tap[:n]
    return qcin, qcout, qctap


def batch_qwin_corrections(maps, caps, capc=None, group=4, maxoff=5):
    """Correction lists for every packed-window map of a batched ladder
    build. `maps`: the batched LADDER_KEYS dict; `capc`: int, per-map dict,
    or None (QWIN_CORR_CAP_DEFAULT). Returns
    {f'{name}_qcin'/'_qcout'/'_qctap': (B, capc)}. group/maxoff select the
    window variant (quad by default; `batch_pwin_corrections` for pairs)."""
    out = {}
    B = len(maps['sp_submap1'])
    for name in QWIN_MAP_NAMES:
        cap_in = caps[_QWIN_CAP_IN[name]]
        if capc is None or capc is True:
            cc = QWIN_CORR_CAP_DEFAULT[name]
        elif isinstance(capc, dict):
            cc = int(capc[name])
        else:
            cc = int(capc)
        per = [qwin_corr_buckets(np.asarray(maps[name][b]), cap_in, cc,
                                 group, maxoff)
               for b in range(B)]
        out[f'{name}_qcin'] = np.stack([p[0] for p in per])
        out[f'{name}_qcout'] = np.stack([p[1] for p in per])
        out[f'{name}_qctap'] = np.stack([p[2] for p in per])
    return out


def batch_pwin_corrections(maps, caps, capc=None):
    """Pair-window (group 2 / maxoff 3) correction lists; same batch-key
    naming as the quad variant (the device correction path is shared)."""
    return batch_qwin_corrections(maps, caps, capc, group=2, maxoff=3)


def default_caps(max_voxels):
    """Per-stage slot capacities. Strided sparse convs *dilate* the active
    set (each input can touch up to 8 output cells) before later stages
    shrink it; measured on KITTI-like clouds the post-dilation counts stay
    under these bounds."""
    v = int(max_voxels)
    return [v, v, (3 * v) // 4, v // 2, v // 2]


# ---- Focal sparse conv ladder (`pcdet/models/backbones_3d/
# spconv_backbone_focal.py` + `focal_sparse_conv/focal_sparse_conv.py`) ----
#
# The reference's FocalSparseConv *grows* the active set at runtime: a
# learned importance head picks foreground voxels and spawns new (zero-
# feature) voxels at kernel offsets whose predicted mask clears a
# threshold. Dynamic set growth is untraceable on TPU, so the recast is:
# the host precomputes the MAXIMAL candidate-dilated table E = actives
# UNION 26-neighborhood(candidates) per focal stage (geometry only), and
# the device flows per-slot ACTIVATION BITS through the ladder — the
# learned mask only toggles bits, never shapes. Inactive slots hold zeros
# and are masked, so conv semantics over the realized active set are
# exact; capacity overflow truncates by flat-key order (the same
# saturation convention as the plain ladder caps).

_KERNEL_OFFSETS_26 = None


def focal_kernel_offsets():
    """The 26 non-center offsets of a 3x3x3 kernel in the reference's
    channel order (`focal_sparse_conv.py:42-44`: z outer, y, x inner,
    [0,0,0] removed); channel 26 is the center-voxel mask."""
    global _KERNEL_OFFSETS_26
    if _KERNEL_OFFSETS_26 is None:
        offs = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                for k in (-1, 0, 1)]
        offs.remove((0, 0, 0))
        _KERNEL_OFFSETS_26 = np.asarray(offs, np.int32)
    return _KERNEL_OFFSETS_26


def _dilate_table(coords, n_valid, dims, cap_e):
    """Maximal focal dilation of an active table: E = sites UNION their 26
    in-bounds neighbors, sorted by flat key, capped at cap_e. Returns
    (ecoords (cap_e, 3), n_e, eorig (cap_e,) slot of the site in the BASE
    table or cap_base, espawn (cap_e, 26) base slot of ecoord - offset_j
    or cap_base)."""
    cap_base = len(coords)
    offs = focal_kernel_offsets()
    c = coords[:n_valid]
    nbr = (c[:, None, :] + offs[None]).reshape(-1, 3)
    ok = np.all((nbr >= 0) & (nbr < np.asarray(dims)), axis=-1)
    base_keys = _flat(c, dims)
    cand_keys = np.setdiff1d(np.unique(_flat(nbr[ok], dims)), base_keys)
    # saturation keeps ALL original sites (they carry real features) and
    # truncates spawn-candidate cells by flat-key order
    room = max(cap_e - len(base_keys), 0)
    u = np.sort(np.concatenate([base_keys, cand_keys[:room]]))[:cap_e]
    n_e = len(u)
    ecoords = np.zeros((cap_e, 3), np.int32)
    ecoords[:n_e, 2] = u % dims[2]
    ecoords[:n_e, 1] = (u // dims[2]) % dims[1]
    ecoords[:n_e, 0] = u // (dims[2] * dims[1])
    sk = _flat(coords, dims)
    eorig = _lookup(sk, n_valid, _flat(ecoords, dims))
    eorig[n_e:] = cap_base
    # spawn sources: slot of (ecoord - off_j) in the base table; the device
    # checks fg[src] & (sigmoid(imp[src, j]) >= threshold). The landing site
    # must satisfy the reference's STRICT bound `coord > 0` on every axis
    # (`split_voxels:130-131` uses `> 0`, not `>= 0`) — coordinate-0 cells
    # can never be spawn-activated.
    src = ecoords[:, None, :] - offs[None]
    oks = np.all((src >= 0) & (src < np.asarray(dims)), axis=-1)
    oks &= (ecoords.min(axis=-1) > 0)[:, None]
    oks[n_e:] = False
    espawn = _lookup(sk, n_valid, _flat(src.reshape(-1, 3), dims))
    espawn = np.where(oks, espawn.reshape(cap_e, 26), cap_base)
    return ecoords, n_e, eorig.astype(np.int32), espawn.astype(np.int32)


FOCAL_KEYS = (
    ['fl_perm1']
    + sum([[f'fl_coords{s}', f'fl_cmask{s}', f'fl_submap{s}',
            f'fl_ecoords{s}', f'fl_emask{s}', f'fl_eorig{s}',
            f'fl_espawn{s}', f'fl_esubmap{s}'] for s in (1, 2, 3)], [])
    + ['fl_downmap2', 'fl_downmap3', 'fl_downmap4',
       'fl_coords4', 'fl_cmask4', 'fl_submap4',
       'fl_coords_out', 'fl_cmask_out', 'fl_outmap']
)


def build_focal_ladder_maps(coords, n_valid, grid_size_whd, caps, ecaps):
    """Kernel maps for `VoxelBackBone8xFocal` (one sample): the plain
    ladder interleaved with maximal-dilation tables at stages 1-3. caps:
    candidate-site capacities [capC1..capC4, cap_out]; ecaps: dilated
    capacities [capE1, capE2, capE3]. Downstream stages are built from the
    *dilated* tables, so every slot any learned mask could activate has a
    precomputed site + kernel map."""
    dims = ladder_shapes(grid_size_whd)
    cap1 = caps[0]
    n1 = min(int(n_valid), cap1)
    keys_in = _flat(coords[:n1].astype(np.int32), dims[0])
    order = np.argsort(keys_in, kind='stable').astype(np.int32)
    c1 = np.zeros((cap1, 3), np.int32)
    c1[:n1] = coords[:n1][order]
    perm = np.zeros((cap1,), np.int32)
    perm[:n1] = order
    out = {'fl_perm1': perm}
    prev_e, prev_ne, prev_dims, prev_cape = None, 0, dims[0], 0
    c, n = c1, n1
    for s in (1, 2, 3):
        d = dims[s - 1]
        capc = len(c)
        out[f'fl_coords{s}'] = c
        out[f'fl_cmask{s}'] = (np.arange(capc) < n)
        out[f'fl_submap{s}'] = _subm_map(c, n, d, (3, 3, 3))
        ec, ne, eorig, espawn = _dilate_table(c, n, d, ecaps[s - 1])
        out[f'fl_ecoords{s}'] = ec
        out[f'fl_emask{s}'] = (np.arange(ecaps[s - 1]) < ne)
        out[f'fl_eorig{s}'] = eorig
        out[f'fl_espawn{s}'] = espawn
        out[f'fl_esubmap{s}'] = _subm_map(ec, ne, d, (3, 3, 3))
        ks, st, pd = _DOWN_SPECS[s - 1]
        c, n, _ = _down_sites(ec, ne, d, ks, st, pd, caps[s])
        out[f'fl_downmap{s + 1}'] = _down_map(ec, ne, d, c, n, ks, st, pd)
    out['fl_coords4'] = c
    out['fl_cmask4'] = (np.arange(caps[3]) < n)
    out['fl_submap4'] = _subm_map(c, n, dims[3], (3, 3, 3))
    ks, st, pd = _DOWN_SPECS[3]
    co, no, _ = _down_sites(c, n, dims[3], ks, st, pd, caps[4])
    out['fl_coords_out'] = co
    out['fl_cmask_out'] = (np.arange(caps[4]) < no)
    out['fl_outmap'] = _down_map(c, n, dims[3], co, no, ks, st, pd)
    return out


def batch_build_focal(voxel_coords, voxel_mask, grid_size_whd, caps, ecaps):
    per = [build_focal_ladder_maps(np.asarray(voxel_coords[b]),
                                   int(np.sum(voxel_mask[b])),
                                   grid_size_whd, caps, ecaps)
           for b in range(len(voxel_coords))]
    return {k: np.stack([p[k] for p in per]) for k in FOCAL_KEYS}


# ---- VoxelNeXt BEV sparse set (`pcdet/models/dense_heads/voxelnext_head.py`
# consumes the backbone's 2D sparse output; here the 3D out-actives are
# height-compressed on host into a BEV slot table + 3x3 submanifold map) ----

BEV_KEYS = ['sp_bev_coords', 'sp_bev_mask', 'sp_bev_from_out',
            'sp_bev_submap']


def build_bev_maps(coords_out, n_valid, bev_hw):
    """One sample. coords_out: (cap, 3) zyx out-actives (sorted); bev_hw:
    (H, W) of the stride-8 BEV grid. Returns: sp_bev_coords (cap, 2) (y, x)
    sorted by y*W+x; sp_bev_mask (cap,); sp_bev_from_out (cap,) mapping each
    out slot to its BEV slot (cap = absent); sp_bev_submap (cap, 9) 3x3
    neighbor slots ((dy, dx) taps, x innermost)."""
    H, W = (int(v) for v in bev_hw)
    cap = len(coords_out)
    c = coords_out[:n_valid]
    key = c[:, 1].astype(np.int64) * W + c[:, 2]
    uniq = np.unique(key)
    nb = min(len(uniq), cap)
    uniq = uniq[:nb]
    bev = np.zeros((cap, 2), np.int32)
    bev[:nb, 0] = uniq // W
    bev[:nb, 1] = uniq % W
    mask = np.arange(cap) < nb
    pos = np.searchsorted(uniq, key)
    pos_c = np.minimum(pos, max(nb - 1, 0))
    hit = (nb > 0) & (uniq[pos_c] == key)
    from_out = np.full((cap,), cap, np.int32)
    from_out[:n_valid] = np.where(hit, pos_c, cap)
    # 3x3 submanifold neighbor map over the BEV set
    offs = np.stack(np.meshgrid(np.arange(3) - 1, np.arange(3) - 1,
                                indexing='ij'), -1).reshape(-1, 2)  # (9, 2)
    nbr = bev[:, None, :] + offs[None]                              # (cap,9,2)
    ok = np.all((nbr >= 0) & (nbr < [H, W]), axis=-1)
    ok[nb:] = False
    q = nbr[..., 0].astype(np.int64) * W + nbr[..., 1]
    p2 = np.searchsorted(uniq, q.reshape(-1))
    p2c = np.minimum(p2, max(nb - 1, 0))
    hit2 = (nb > 0) & (uniq[p2c] == q.reshape(-1))
    submap = np.where(hit2, p2c, cap).astype(np.int32).reshape(cap, 9)
    submap = np.where(ok, submap, cap).astype(np.int32)
    return {'sp_bev_coords': bev, 'sp_bev_mask': mask,
            'sp_bev_from_out': from_out, 'sp_bev_submap': submap}


def batch_build_bev(coords_out, mask_out, bev_hw):
    per = [build_bev_maps(np.asarray(coords_out[b]),
                          int(np.sum(mask_out[b])), bev_hw)
           for b in range(len(coords_out))]
    return {k: np.stack([p[k] for p in per]) for k in BEV_KEYS}
