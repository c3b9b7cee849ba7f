"""Host-side brick-table builder for the brick-dense sparse voxel backbone.

Second TPU-native recast of spconv's `VoxelBackBone8x`
(`pcdet/models/backbones_3d/spconv_backbone.py:70-180`), complementing the
slot-table ladder (`sparse_maps.py`): the active set is covered by dense
4x4x4 BRICKS. Each conv layer then becomes

    assemble a 6x6x6 halo-extended brick (x faces, then y faces of the
    x-extended table, then z faces of the yx-extended table — three wide
    slab gathers; absent bricks read zeros)  ->  one `conv3d` over
    (N_bricks, 6,6,6, C) on the MXU  ->  mask to the exact active cells.

Rationale (round-3 microbenchmarks): XLA's row gather ceilings at
~50 GB/s, making the slot-table ladder gather-bound (~121 ms/batch at the
0.05 m KITTI grid), while `conv3d` on brick batches runs at 15-32 TF/s and
slab gathers move 16-36C-wide rows at full gather bandwidth.

Semantics are EXACT spconv (parity-tested against the slot ladder in
tests/test_brick_backbone.py): inactive cells hold zeros and are re-masked
after every layer, so submanifold convs read only active neighbors;
strided convs compute every cell of each active output brick and mask to
the exact active output set.

Strided conv coverage: output cell o of a k3s2p1 (or k311s211p0 conv_out)
conv reads inputs 2o-1..2o+1 (2o..2o+2), and is computed by the input
brick containing cell 2o. Wherever an ACTIVE output cell's source brick
is not itself active, the host adds a PHANTOM input brick (zero features,
zero cell mask) so the stride-2 `conv3d` over input bricks covers every
active output cell; phantom rows are inert in the submanifold layers
because their outputs are masked to zero.

Conventions:
- cell coords are (V, 3) int32 zyx; brick coords = cell // 4, sorted by
  flat brick key; slot `cap` = absent.
- cell order inside a brick: local (z, y, x), flat z*16 + y*4 + x.
- face-neighbor order in bk_nbr: [z-, z+, y-, y+, x-, x+].
- down maps bk_downsrc: per output brick, the 8 octant source input-brick
  slots, octant flat (oz*4 + oy*2 + ox); conv_out uses 2 z-halves.
"""
from __future__ import annotations

import numpy as np

from .sparse_maps import _DOWN_SPECS, _flat, ladder_shapes

BRICK = 4

BRICK_KEYS = (
    ['bk_cellidx1']
    + sum([[f'bk_coords{s}', f'bk_cellmask{s}', f'bk_nbr{s}']
           for s in (1, 2, 3, 4)], [])
    + ['bk_downsrc2', 'bk_downsrc3', 'bk_downsrc4',
       'bk_coords_out', 'bk_cellmask_out', 'bk_downsrc_out']
)


def brick_dims(cell_dims):
    return tuple((d + BRICK - 1) // BRICK for d in cell_dims)


def _bflat(bcoords, bdims):
    _, H, W = bdims
    return (bcoords[:, 0].astype(np.int64) * H + bcoords[:, 1]) * W \
        + bcoords[:, 2]


def _down_cells(cells, dims, ksize, stride, pad):
    """Active output cells of a strided sparse conv (unpadded; the cell-level
    analog of `sparse_maps._down_sites`)."""
    dims_out = tuple((d + 2 * p - k) // s + 1
                     for d, k, s, p in zip(dims, ksize, stride, pad))
    per_axis = []
    for ax, (k, s, p) in enumerate(zip(ksize, stride, pad)):
        num = cells[:, ax:ax + 1] + p - np.arange(k)[None, :]
        ok = (num % s == 0) & (num >= 0)
        o = num // s
        ok &= o < dims_out[ax]
        per_axis.append((o, ok))
    (oz, okz), (oy, oky), (ox, okx) = per_axis
    z = oz[:, :, None, None]
    y = oy[:, None, :, None]
    x = ox[:, None, None, :]
    ok = okz[:, :, None, None] & oky[:, None, :, None] & okx[:, None, None, :]
    flat = (z.astype(np.int64) * dims_out[1] + y) * dims_out[2] + x
    uniq = np.unique(flat[ok])
    out = np.stack([uniq // (dims_out[1] * dims_out[2]),
                    (uniq // dims_out[2]) % dims_out[1],
                    uniq % dims_out[2]], -1).astype(np.int32)
    return out, dims_out


def _brick_table(cells, dims, phantom_src=None, cap=None):
    """Brick set covering `cells`, plus optional phantom bricks.

    phantom_src: (M, 3) brick coords that must be present (down-conv
    sources). Returns (bcoords (cap, 3) sorted, n_bricks, cellmask
    (cap, 64) bool, bdims)."""
    bd = brick_dims(dims)
    bc = cells // BRICK
    keys = np.unique(_bflat(bc, bd))
    if phantom_src is not None and len(phantom_src):
        ph = phantom_src[np.all((phantom_src >= 0)
                                & (phantom_src < np.asarray(bd)), axis=-1)]
        ph_keys = np.setdiff1d(np.unique(_bflat(ph, bd)), keys)
        # saturation keeps every ACTIVE brick (they carry features) and
        # truncates phantom bricks by flat-key order
        room = len(ph_keys) if cap is None else max(cap - len(keys), 0)
        keys = np.sort(np.concatenate([keys, ph_keys[:room]]))
    n = len(keys)
    if cap is not None and n > cap:
        keys = keys[:cap]           # flat-key order saturation (same
        n = cap                      # convention as the slot ladder caps)
    capn = cap if cap is not None else n
    bcoords = np.zeros((capn, 3), np.int32)
    bcoords[:n, 0] = keys // (bd[1] * bd[2])
    bcoords[:n, 1] = (keys // bd[2]) % bd[1]
    bcoords[:n, 2] = keys % bd[2]
    # cell mask: scatter active cells into their brick slots
    cellmask = np.zeros((capn, BRICK ** 3), bool)
    pos = np.searchsorted(keys, _bflat(bc, bd))
    pos_c = np.minimum(pos, max(n - 1, 0))
    hit = (n > 0) & (keys[pos_c] == _bflat(bc, bd))
    loc = cells - bc * BRICK
    lidx = (loc[:, 0] * BRICK + loc[:, 1]) * BRICK + loc[:, 2]
    cellmask[pos_c[hit], lidx[hit]] = True
    return bcoords, n, cellmask, bd


def _lookup_bricks(keys, n, queries):
    cap = len(keys)
    if n <= 0:
        return np.full(queries.shape, cap, np.int32)
    k = keys[:n]
    pos = np.searchsorted(k, queries)
    pos_c = np.minimum(pos, n - 1)
    return np.where(k[pos_c] == queries, pos_c, cap).astype(np.int32)


def _face_neighbors(bcoords, n, bdims):
    """(cap, 6) face-neighbor slots [z-, z+, y-, y+, x-, x+]."""
    cap = len(bcoords)
    keys = _bflat(bcoords, bdims)
    offs = np.asarray([[-1, 0, 0], [1, 0, 0], [0, -1, 0],
                       [0, 1, 0], [0, 0, -1], [0, 0, 1]], np.int32)
    nbr = bcoords[:, None, :] + offs[None]
    ok = np.all((nbr >= 0) & (nbr < np.asarray(bdims)), axis=-1)
    ok[n:] = False
    out = _lookup_bricks(np.sort(keys[:n]), n, _bflat(
        nbr.reshape(-1, 3), bdims)).reshape(cap, 6)
    # keys[:n] are already sorted (brick tables are built sorted)
    return np.where(ok, out, cap).astype(np.int32)


def _down_sources(out_bcoords, n_out, in_keys_sorted, n_in, in_bdims,
                  z_only=False):
    """(cap_out, 8) or (cap_out, 2): per output brick octant/z-half, the
    source input-brick slot (= brick containing cell 2o per strided axis)."""
    cap_out = len(out_bcoords)
    if z_only:
        octs = np.asarray([0, 1], np.int32)                # z halves
        src = np.stack([out_bcoords[:, None, 0] * 2 + octs[None],
                        np.broadcast_to(out_bcoords[:, None, 1],
                                        (cap_out, 2)),
                        np.broadcast_to(out_bcoords[:, None, 2],
                                        (cap_out, 2))], -1)
        K = 2
    else:
        oz, oy, ox = np.meshgrid(np.arange(2), np.arange(2), np.arange(2),
                                 indexing='ij')
        octs = np.stack([oz, oy, ox], -1).reshape(-1, 3)   # (8, 3)
        src = out_bcoords[:, None, :] * 2 + octs[None]
        K = 8
    ok = np.all((src >= 0) & (src < np.asarray(in_bdims)), axis=-1)
    ok[n_out:] = False
    out = _lookup_bricks(in_keys_sorted, n_in,
                         _bflat(src.reshape(-1, 3), in_bdims)).reshape(
                             cap_out, K)
    cap_in = len(in_keys_sorted)
    return np.where(ok, out, cap_in).astype(np.int32)


def build_brick_ladder(coords, n_valid, grid_size_whd, caps):
    """One sample. coords: (capV, 3) int32 zyx voxel coords (valid prefix
    n_valid); caps: brick capacities [cap1..cap4, cap_out]. Returns the
    BRICK_KEYS dict."""
    dims = ladder_shapes(grid_size_whd)
    cells = [np.asarray(coords[:min(int(n_valid), len(coords))], np.int32)]
    for spec, d in zip(_DOWN_SPECS, dims):
        ks, st, pd = spec
        c, _ = _down_cells(cells[-1], d, ks, st, pd)
        cells.append(c)

    out = {}
    tables = []
    for s in (1, 2, 3, 4):
        d = dims[s - 1]
        # phantom sources: bricks containing cell 2o (per strided axis) of
        # the NEXT stage's active cells
        nxt = cells[s]
        if s < 4:
            ph = (2 * nxt) // BRICK
        else:                        # conv_out strides z only (p=0)
            ph = np.stack([(2 * nxt[:, 0]) // BRICK, nxt[:, 1] // BRICK,
                           nxt[:, 2] // BRICK], -1)
        bcoords, n, cellmask, bd = _brick_table(
            cells[s - 1], d, phantom_src=np.unique(ph, axis=0),
            cap=caps[s - 1])
        out[f'bk_coords{s}'] = bcoords
        out[f'bk_cellmask{s}'] = cellmask
        out[f'bk_nbr{s}'] = _face_neighbors(bcoords, n, bd)
        tables.append((bcoords, n, bd))

    # stage-1 feature placement: voxel -> brick*64 + local (cap = drop)
    bc1, n1, bd1 = tables[0]
    keys1 = _bflat(bc1, bd1)[:n1]
    v = cells[0]
    slots = _lookup_bricks(keys1, n1, _bflat(v // BRICK, bd1))
    loc = v - (v // BRICK) * BRICK
    lidx = (loc[:, 0] * BRICK + loc[:, 1]) * BRICK + loc[:, 2]
    cellidx = np.full((len(coords),), len(bc1) * BRICK ** 3, np.int32)
    valid = slots < len(bc1)
    cellidx[:len(v)] = np.where(valid, slots * BRICK ** 3 + lidx,
                                len(bc1) * BRICK ** 3)
    out['bk_cellidx1'] = cellidx

    # down-source maps for stages 2..4
    for s in (2, 3, 4):
        bc_in, n_in, bd_in = tables[s - 2]
        bc_out, n_out, _ = tables[s - 1]
        out[f'bk_downsrc{s}'] = _down_sources(
            bc_out, n_out, _bflat(bc_in, bd_in)[:n_in], n_in, bd_in)

    # conv_out stage
    bco, no, cmo, bdo = _brick_table(cells[4], dims[4], cap=caps[4])
    out['bk_coords_out'] = bco
    out['bk_cellmask_out'] = cmo
    bc4, n4, bd4 = tables[3]
    out['bk_downsrc_out'] = _down_sources(
        bco, no, _bflat(bc4, bd4)[:n4], n4, bd4, z_only=True)
    return out


def batch_build_brick(voxel_coords, voxel_mask, grid_size_whd, caps):
    per = [build_brick_ladder(np.asarray(voxel_coords[b]),
                              int(np.sum(voxel_mask[b])),
                              grid_size_whd, caps)
           for b in range(len(voxel_coords))]
    return {k: np.stack([p[k] for p in per]) for k in BRICK_KEYS}


def default_brick_caps(max_voxels):
    """Measured brick counts on KITTI-like 0.05 m clouds stay well under
    these (bricks dilate slower than cells: stage-2/3 cell dilation lands
    mostly inside already-active bricks)."""
    v = int(max_voxels)
    return [v // 2, v // 2, (3 * v) // 8, v // 8, v // 8]
