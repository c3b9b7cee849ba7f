"""visual_utils coverage (parity role of reference `tools/visual_utils/*`).

Pins the BEV corner geometry against the canonical box_ops corner routine and
verifies the matplotlib renderer produces a real image file end-to-end (the
open3d path is import-gated; this image ships without open3d)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / 'tools'))
from visual_utils.visualize_utils import _box_corners_bev, draw_scenes, draw_scenes_bev  # noqa: E402

from pdm_ssd_tpu.utils.np_iou import _bev_corners  # noqa: E402


def _boxes():
    return np.array([
        [0.0, 0.0, 0.0, 4.0, 1.8, 1.5, 0.0],
        [5.0, -3.0, 0.2, 3.6, 1.6, 1.4, 0.7],
        [-4.0, 6.0, -0.1, 0.8, 0.6, 1.7, -2.1],
    ], np.float32)


def test_bev_corners_match_np_iou_geometry():
    boxes = _boxes()
    got = _box_corners_bev(boxes)                       # (N, 4, 2)
    want = _bev_corners(boxes)                          # canonical rotated corners
    # corner ORDER conventions may differ between the two routines; compare as
    # point sets per box (each corner must appear exactly once).
    for g, w in zip(got, want):
        gs = sorted(map(tuple, np.round(g, 4)))
        ws = sorted(map(tuple, np.round(w, 4)))
        np.testing.assert_allclose(gs, ws, atol=1e-3)


def test_draw_scenes_bev_writes_png(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-10, 10, size=(500, 4)).astype(np.float32)
    out = tmp_path / 'scene.png'
    ret = draw_scenes_bev(pts, gt_boxes=_boxes(), ref_boxes=_boxes() + 0.5,
                          ref_scores=np.array([0.9, 0.8, 0.7], np.float32),
                          ref_labels=np.array([1, 2, 3]),
                          save_path=str(out), title='test scene')
    assert ret == str(out)
    data = out.read_bytes()
    assert data[:8] == b'\x89PNG\r\n\x1a\n' and len(data) > 1000


def test_draw_scenes_dispatch_without_open3d(tmp_path, monkeypatch):
    # open3d is absent in this image: draw_scenes must fall back to the BEV png.
    monkeypatch.chdir(tmp_path)
    pts = np.zeros((10, 4), np.float32)
    ret = draw_scenes(pts, ref_boxes=_boxes(), save_path=str(tmp_path / 'x.png'))
    assert Path(ret).exists()


def test_draw_scenes_3d_writes_png(tmp_path):
    from visual_utils.visualize_utils import draw_scenes_3d, _box_corners_3d
    rng = np.random.RandomState(0)
    pts = np.concatenate([rng.uniform(0, 40, (500, 1)),
                          rng.uniform(-20, 20, (500, 1)),
                          rng.uniform(-2, 1, (500, 1)),
                          rng.rand(500, 1)], 1).astype(np.float32)
    ret = draw_scenes_3d(pts, gt_boxes=_boxes(), ref_boxes=_boxes() + 0.5,
                         ref_scores=np.array([0.9]),
                         save_path=str(tmp_path / 's3d.png'))
    import os
    assert os.path.exists(ret) and os.path.getsize(ret) > 10000
    # corner geometry: edges of the axis-aligned unit box have the box dims
    c8 = _box_corners_3d(np.array([[0, 0, 0, 4.0, 2.0, 1.5, 0.0]]))[0]
    assert np.allclose(c8.max(0) - c8.min(0), [4.0, 2.0, 1.5])
    # rotation by pi/2 swaps the BEV extents
    c8r = _box_corners_3d(np.array([[0, 0, 0, 4.0, 2.0, 1.5,
                                     np.pi / 2]]))[0]
    assert np.allclose(c8r.max(0) - c8r.min(0), [2.0, 4.0, 1.5], atol=1e-5)
