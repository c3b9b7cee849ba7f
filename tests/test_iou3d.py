"""Rotated IoU / NMS correctness: analytic axis-aligned cases, Monte-Carlo
cross-check of the polygon clipping, and NMS suppression semantics
(oracle of `pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu`)."""
import numpy as np

from pdm_ssd_tpu.ops import iou3d


def box(x, y, dx, dy, r, z=0.0, dz=2.0):
    return np.array([x, y, z, dx, dy, dz, r], np.float32)


def mc_overlap(a, b, n=200_000, seed=0):
    """Monte-Carlo BEV intersection area oracle."""
    rs = np.random.RandomState(seed)
    lo = np.minimum(a[:2] - np.hypot(a[3], a[4]), b[:2] - np.hypot(b[3], b[4]))
    hi = np.maximum(a[:2] + np.hypot(a[3], a[4]), b[:2] + np.hypot(b[3], b[4]))
    pts = rs.uniform(lo, hi, size=(n, 2))

    def inside(p, bx):
        d = p - bx[:2]
        c, s = np.cos(-bx[6]), np.sin(-bx[6])
        lx = d[:, 0] * c - d[:, 1] * s
        ly = d[:, 0] * s + d[:, 1] * c
        return (np.abs(lx) <= bx[3] / 2) & (np.abs(ly) <= bx[4] / 2)

    hit = inside(pts, a) & inside(pts, b)
    return hit.mean() * np.prod(hi - lo)


def test_identical_boxes():
    a = box(0, 0, 4, 2, 0.3)
    iou = np.asarray(iou3d.boxes_iou_bev(a[None], a[None]))[0, 0]
    np.testing.assert_allclose(iou, 1.0, atol=1e-5)


def test_disjoint_boxes():
    a, b = box(0, 0, 2, 2, 0.0), box(10, 0, 2, 2, 1.0)
    iou = np.asarray(iou3d.boxes_iou_bev(a[None], b[None]))[0, 0]
    np.testing.assert_allclose(iou, 0.0, atol=1e-6)


def test_axis_aligned_overlap():
    a, b = box(0, 0, 4, 4, 0.0), box(2, 2, 4, 4, 0.0)
    ov = np.asarray(iou3d.boxes_overlap_bev(a[None], b[None]))[0, 0]
    np.testing.assert_allclose(ov, 4.0, atol=1e-4)  # 2x2 overlap


def test_45deg_rotation_analytic():
    # unit square vs same square rotated 45deg: intersection is regular octagon
    # with area 8*(sqrt(2)-1)/2 = 4*(sqrt(2)-1) ... for unit square: 2*(sqrt(2)-1)
    a = box(0, 0, 1, 1, 0.0)
    b = box(0, 0, 1, 1, np.pi / 4)
    ov = np.asarray(iou3d.boxes_overlap_bev(a[None], b[None]))[0, 0]
    np.testing.assert_allclose(ov, 2 * (np.sqrt(2) - 1), atol=1e-5)


def test_random_boxes_match_monte_carlo(rng):
    for seed in range(6):
        rs = np.random.RandomState(seed)
        a = box(rs.uniform(-2, 2), rs.uniform(-2, 2), rs.uniform(1, 5),
                rs.uniform(1, 5), rs.uniform(-np.pi, np.pi))
        b = box(rs.uniform(-2, 2), rs.uniform(-2, 2), rs.uniform(1, 5),
                rs.uniform(1, 5), rs.uniform(-np.pi, np.pi))
        got = float(np.asarray(iou3d.boxes_overlap_bev(a[None], b[None]))[0, 0])
        want = mc_overlap(a, b)
        assert abs(got - want) < 0.05 * max(want, 1.0), (seed, got, want)


def test_iou3d_height():
    a = box(0, 0, 2, 2, 0.0, z=0.0, dz=2.0)
    b = box(0, 0, 2, 2, 0.0, z=1.0, dz=2.0)  # half height overlap
    got = np.asarray(iou3d.boxes_iou3d(a[None], b[None]))[0, 0]
    np.testing.assert_allclose(got, (4.0 * 1.0) / (8 + 8 - 4), atol=1e-5)


def test_nms_suppression():
    boxes = np.stack([
        box(0, 0, 4, 2, 0.0),
        box(0.1, 0, 4, 2, 0.0),   # heavy overlap with #0 -> suppressed
        box(10, 0, 4, 2, 0.0),    # kept
        box(10.05, 0, 4, 2, 0.0),  # suppressed by #2
        box(-10, 5, 4, 2, 1.0),   # kept
    ])
    scores = np.array([0.9, 0.8, 0.95, 0.7, 0.6], np.float32)
    idx, mask = iou3d.nms_bev(boxes, scores, 0.5, pre_maxsize=5, post_maxsize=5)
    idx, mask = np.asarray(idx), np.asarray(mask)
    kept = set(idx[mask].tolist())
    assert kept == {0, 2, 4}
    # score-ordered output
    assert idx[mask].tolist() == [2, 0, 4]


def test_nms_respects_valid_mask():
    boxes = np.stack([box(0, 0, 4, 2, 0.0), box(20, 0, 4, 2, 0.0)])
    scores = np.array([0.9, 0.8], np.float32)
    valid = np.array([True, False])
    idx, mask = iou3d.nms_bev(boxes, scores, 0.5, 4, 4, valid=valid)
    assert np.asarray(mask).sum() == 1
    assert np.asarray(idx)[0] == 0


def test_suppression_matrix_blocked_matches_full():
    """Row-blocked suppression (bounded-HBM path for big NMS_PRE) is
    bit-identical to the full KxK computation."""
    import numpy as np
    import jax.numpy as jnp
    from pdm_ssd_tpu.ops.iou3d import _suppression_matrix, boxes_iou_bev
    rng = np.random.RandomState(3)
    K = 37  # not a multiple of the block to exercise the pad/trim
    boxes = np.zeros((K, 7), np.float32)
    boxes[:, :2] = rng.uniform(-10, 10, (K, 2))
    boxes[:, 2] = rng.uniform(-1, 1, K)
    boxes[:, 3:6] = rng.uniform(0.5, 4.0, (K, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, K)
    b = jnp.asarray(boxes)
    full = np.asarray(boxes_iou_bev(b, b) > 0.1)
    blocked = np.asarray(_suppression_matrix(b, 0.1, blk=8))
    np.testing.assert_array_equal(blocked, full)
