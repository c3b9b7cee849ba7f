"""Native C++ host ops vs numpy references (skipped when g++ unavailable)."""
import numpy as np
import pytest

from pdm_ssd_tpu import csrc
from pdm_ssd_tpu.utils import np_iou


pytestmark = pytest.mark.skipif(csrc.lib() is None, reason='no g++ available')


def _np_overlap(boxes_a, boxes_b):
    """numpy clipping path, bypassing the native fast path."""
    def to7(r):
        out = np.zeros((len(r), 7), np.float32)
        out[:, 0:2] = r[:, 0:2]
        out[:, 3:5] = r[:, 2:4]
        out[:, 6] = r[:, 4]
        return out
    # call the private vectorized implementation pieces directly
    a7, b7 = to7(boxes_a), to7(boxes_b)
    ca = np_iou._bev_corners(a7)
    import pdm_ssd_tpu.utils.np_iou as m
    # reconstruct via the public API with native disabled
    import pdm_ssd_tpu.csrc as c
    saved = c._LIB
    c._LIB = None
    try:
        out = np_iou.boxes_bev_overlap_cpu(a7, b7)
    finally:
        c._LIB = saved
    return out


def test_native_overlap_matches_numpy(rng):
    rects_a = np.stack([rng.uniform(-5, 5, 20), rng.uniform(-5, 5, 20),
                        rng.uniform(1, 5, 20), rng.uniform(1, 5, 20),
                        rng.uniform(-np.pi, np.pi, 20)], 1).astype(np.float32)
    rects_b = np.stack([rng.uniform(-5, 5, 15), rng.uniform(-5, 5, 15),
                        rng.uniform(1, 5, 15), rng.uniform(1, 5, 15),
                        rng.uniform(-np.pi, np.pi, 15)], 1).astype(np.float32)
    native = csrc.rotated_overlap_bev(rects_a, rects_b)
    ref = _np_overlap(rects_a, rects_b)
    np.testing.assert_allclose(native, ref, rtol=1e-3, atol=1e-3)


def test_native_points_in_boxes(rng):
    boxes = np.array([[0, 0, 0, 4, 2, 2, 0.5]], np.float32)
    pts = rng.uniform(-3, 3, (500, 3)).astype(np.float32)
    native = csrc.points_in_boxes_cpu(pts, boxes)
    # numpy reference
    shift = pts[None, :, :] - boxes[:, None, :3]
    ca, sa = np.cos(-boxes[:, 6]), np.sin(-boxes[:, 6])
    lx = shift[..., 0] * ca[:, None] - shift[..., 1] * sa[:, None]
    ly = shift[..., 0] * sa[:, None] + shift[..., 1] * ca[:, None]
    want = ((np.abs(shift[..., 2]) <= 1.0) & (np.abs(lx) < 2.0 + 1e-5)
            & (np.abs(ly) < 1.0 + 1e-5)).astype(np.int32)
    np.testing.assert_array_equal(native, want)


def test_native_voxelize(rng):
    pts = rng.uniform(0, 10, (1000, 4)).astype(np.float32)
    out = csrc.voxelize(pts, [1.0, 1.0, 10.0], [0., 0., 0.], [10, 10, 1],
                        max_pts=8, max_vox=200)
    voxels, coords, num = out
    assert len(voxels) == len(coords) == len(num)
    assert (num >= 1).all() and (num <= 8).all()
    # every stored point belongs to its voxel cell
    for v in range(len(coords)):
        iz, iy, ix = coords[v]
        for k in range(num[v]):
            p = voxels[v, k]
            assert int(p[0] // 1.0) == ix and int(p[1] // 1.0) == iy
    # total stored points <= n, cells unique
    keys = coords[:, 0] * 100 + coords[:, 1] * 10 + coords[:, 2]
    assert len(np.unique(keys)) == len(keys)
