"""Host-side brick-table builder (`pdm_ssd_tpu/ops/brick_maps.py`): the
4x4x4 brick covering of the sparse ladder's active sets, validated against
the slot-table builder's cell-level ground truth (`sparse_maps`).

The brick backbone itself is parked (measured occupancy on 0.05 m clouds is
below the halo break-even — BENCH_NOTES round 3), but the builder is the
decision infrastructure and must stay correct.
"""
import numpy as np

from pdm_ssd_tpu.ops.brick_maps import (BRICK, brick_dims, build_brick_ladder,
                                        _down_cells)
from pdm_ssd_tpu.ops.sparse_maps import _DOWN_SPECS, ladder_shapes


def _cloud(rng, n=800, dims=(42, 160, 176)):
    cells = np.unique(
        np.stack([rng.randint(0, dims[0] - 1, n),
                  rng.randint(0, dims[1], n),
                  rng.randint(0, dims[2], n)], -1), axis=0).astype(np.int32)
    key = (cells[:, 0].astype(np.int64) * dims[1] + cells[:, 1]) * dims[2] \
        + cells[:, 2]
    return cells[np.argsort(key)]


def test_brick_tables_cover_cells(rng):
    grid = (176, 160, 41)                       # (W, H, D)
    dims = ladder_shapes(grid)
    coords = _cloud(rng)
    caps = [4000] * 5
    out = build_brick_ladder(coords, len(coords), grid, caps)

    cells = [coords]
    for spec, d in zip(_DOWN_SPECS, dims):
        cells.append(_down_cells(cells[-1], d, *spec)[0])

    for s, cellset, dkey, ckey in [
            (1, cells[0], 'bk_cellmask1', 'bk_coords1'),
            (2, cells[1], 'bk_cellmask2', 'bk_coords2'),
            (3, cells[2], 'bk_cellmask3', 'bk_coords3'),
            (4, cells[3], 'bk_cellmask4', 'bk_coords4'),
            ('out', cells[4], 'bk_cellmask_out', 'bk_coords_out')]:
        bc, cm = out[ckey], out[dkey]
        # reconstruct the active cell set from (brick coord, local mask)
        got = []
        for i in np.nonzero(cm.any(axis=1))[0]:
            for l in np.nonzero(cm[i])[0]:
                lz, ly, lx = l // 16, (l // 4) % 4, l % 4
                got.append(bc[i] * BRICK + [lz, ly, lx])
        got = np.sort(np.asarray(got, np.int64), axis=0)
        want = np.sort(cellset.astype(np.int64), axis=0)
        np.testing.assert_array_equal(
            np.sort((got * [10 ** 8, 10 ** 4, 1]).sum(-1)),
            np.sort((want * [10 ** 8, 10 ** 4, 1]).sum(-1)),
            err_msg=f'stage {s}')


def test_brick_down_sources_and_phantoms(rng):
    """Every active output cell's stride-2 source brick (the brick holding
    cell 2o) must be present in the input table (possibly as a phantom) and
    referenced by the output brick's octant map."""
    grid = (176, 160, 41)
    coords = _cloud(rng, n=500)
    caps = [4000] * 5
    out = build_brick_ladder(coords, len(coords), grid, caps)
    dims = ladder_shapes(grid)

    def valid_prefix(keys):
        """Brick tables are sorted strictly-increasing with zero padding."""
        d = np.diff(keys)
        bad = np.nonzero(d <= 0)[0]
        return int(bad[0]) + 1 if len(bad) else len(keys)

    cells_in = coords
    for s, spec in zip((2, 3, 4), _DOWN_SPECS[:3]):
        cells_out = _down_cells(cells_in, dims[s - 2], *spec)[0]
        bc_in = out[f'bk_coords{s - 1}'] if s > 1 else out['bk_coords1']
        src = out[f'bk_downsrc{s}']
        bc_out = out[f'bk_coords{s}']
        bd_in = brick_dims(dims[s - 2])
        key_in = (bc_in[:, 0].astype(np.int64) * bd_in[1] + bc_in[:, 1]) \
            * bd_in[2] + bc_in[:, 2]
        n_in_rows = valid_prefix(key_in)
        # map each active output cell to (output brick, octant); check the
        # octant's source slot points at the brick containing cell 2o
        bd_out = brick_dims(dims[s - 1])
        key_out = (bc_out[:, 0].astype(np.int64) * bd_out[1] + bc_out[:, 1]) \
            * bd_out[2] + bc_out[:, 2]
        n_out = valid_prefix(key_out)
        for o in cells_out[rng.choice(len(cells_out),
                                      min(64, len(cells_out)), replace=False)]:
            ob = o // BRICK
            k = (ob[0].astype(np.int64) * bd_out[1] + ob[1]) * bd_out[2] \
                + ob[2]
            slot = int(np.searchsorted(key_out[:n_out], k))
            assert slot < n_out and key_out[slot] == k, 'output brick missing'
            loc = o - ob * BRICK
            octant = (loc[0] // 2) * 4 + (loc[1] // 2) * 2 + (loc[2] // 2)
            sslot = src[slot, octant]
            assert sslot < n_in_rows, 'source brick absent (phantom missing)'
            want_src = ob * 2 + loc // 2
            np.testing.assert_array_equal(bc_in[sslot], want_src)
        cells_in = cells_out


def test_brick_cellidx_roundtrip(rng):
    grid = (176, 160, 41)
    coords = _cloud(rng, n=300)
    out = build_brick_ladder(coords, len(coords), grid, [4000] * 5)
    idx = out['bk_cellidx1']
    bc = out['bk_coords1']
    for i in range(len(coords)):
        slot, loc = idx[i] // 64, idx[i] % 64
        assert idx[i] < 4000 * 64
        lz, ly, lx = loc // 16, (loc // 4) % 4, loc % 4
        np.testing.assert_array_equal(
            bc[slot] * BRICK + [lz, ly, lx], coords[i])
