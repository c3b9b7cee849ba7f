"""Scene visualization (parity role of `tools/visual_utils/*`).

The baked TPU image has neither open3d nor mayavi, so the default renderer is
a matplotlib BEV plot (`draw_scenes_bev`); `draw_scenes` dispatches to open3d
when available (same API shape as the reference `open3d_vis_utils.draw_scenes
:38`).
"""
from __future__ import annotations

import numpy as np


def _box_corners_bev(boxes):
    """(N, 7) -> (N, 4, 2) BEV corners."""
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    local = np.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], np.float32) / 2.0
    lx = local[None, :, 0] * boxes[:, None, 3]
    ly = local[None, :, 1] * boxes[:, None, 4]
    x = lx * c[:, None] - ly * s[:, None] + boxes[:, None, 0]
    y = lx * s[:, None] + ly * c[:, None] + boxes[:, None, 1]
    return np.stack([x, y], axis=-1)


def draw_scenes_bev(points, gt_boxes=None, ref_boxes=None, ref_scores=None,
                    ref_labels=None, save_path=None, title=None):
    """BEV scatter + box outlines; saves to `save_path` (png) or shows."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 14))
    pts = np.asarray(points)
    ax.scatter(pts[:, 0], pts[:, 1], s=0.2, c=pts[:, 2], cmap='viridis')

    def plot_boxes(boxes, color, labels=None, scores=None):
        corners = _box_corners_bev(np.asarray(boxes))
        for i, c4 in enumerate(corners):
            poly = np.vstack([c4, c4[:1]])
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=1.2)
            if scores is not None:
                ax.text(c4[0, 0], c4[0, 1], f'{scores[i]:.2f}', fontsize=6,
                        color=color)

    if gt_boxes is not None and len(gt_boxes):
        plot_boxes(gt_boxes, 'limegreen')
    if ref_boxes is not None and len(ref_boxes):
        plot_boxes(ref_boxes, 'red', ref_labels, ref_scores)

    ax.set_aspect('equal')
    ax.set_xlabel('x [m]')
    ax.set_ylabel('y [m]')
    if title:
        ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches='tight')
        plt.close(fig)
        return save_path
    return fig


def _box_corners_3d(boxes):
    """(N, 7) -> (N, 8, 3) cuboid corners (bottom 0,1,2,7 / top 6,3,4,5;
    +x is the heading direction before rotation)."""
    boxes = np.asarray(boxes, np.float32)
    tmpl = np.array([[1, -1, -1], [1, 1, -1], [-1, -1, -1], [1, 1, 1],
                     [-1, -1, 1], [-1, 1, 1], [1, -1, 1], [-1, 1, -1]],
                    np.float32) / 2.0
    local = tmpl[None] * boxes[:, None, 3:6]
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    x = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    y = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    out = np.stack([x, y, local[..., 2]], -1) + boxes[:, None, :3]
    return out


# wireframe edges + the two crossed diagonals on the heading (+x) face —
# the reference marks the heading the same way by appending two extra
# lines to the open3d box line set (`open3d_vis_utils.py:96-99`)
_BOX_EDGES = [(0, 1), (1, 7), (7, 2), (2, 0), (6, 3), (3, 5), (5, 4),
              (4, 6), (0, 6), (1, 3), (2, 4), (7, 5), (0, 3), (1, 6)]


def draw_scenes_3d(points, gt_boxes=None, ref_boxes=None, ref_scores=None,
                   ref_labels=None, save_path=None, title=None,
                   max_points=60000, elev=25, azim=-60):
    """Dependency-free 3D scene render (matplotlib mplot3d): point cloud +
    oriented box wireframes — the role of the reference's open3d/mayavi
    `draw_scenes` (`open3d_vis_utils.py:38`, `visualize_utils.py:142`) in
    an image this environment can actually produce. Saves a png."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Line3DCollection

    pts = np.asarray(points)[:, :3]
    if len(pts) > max_points:
        pts = pts[np.linspace(0, len(pts) - 1, max_points).astype(int)]
    fig = plt.figure(figsize=(14, 10))
    ax = fig.add_subplot(projection='3d', computed_zorder=False)
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.15, c=pts[:, 2],
               cmap='viridis', depthshade=False)

    def add_boxes(boxes, color, scores=None):
        corners = _box_corners_3d(boxes)
        segs = [[c8[a], c8[b]] for c8 in corners for a, b in _BOX_EDGES]
        ax.add_collection3d(Line3DCollection(segs, colors=color,
                                             linewidths=1.2))
        if scores is not None:
            for c8, sc in zip(corners, scores):
                ax.text(c8[3, 0], c8[3, 1], c8[3, 2], f'{float(sc):.2f}',
                        fontsize=6, color=color)

    if gt_boxes is not None and len(gt_boxes):
        add_boxes(np.asarray(gt_boxes), 'limegreen')
    if ref_boxes is not None and len(ref_boxes):
        add_boxes(np.asarray(ref_boxes), 'red', ref_scores)

    lo, hi = pts.min(0), pts.max(0)
    mid, rng = (lo + hi) / 2, (hi - lo).max() / 2
    ax.set_xlim(mid[0] - rng, mid[0] + rng)
    ax.set_ylim(mid[1] - rng, mid[1] + rng)
    ax.set_zlim(mid[2] - rng * 0.4, mid[2] + rng * 0.4)
    ax.view_init(elev=elev, azim=azim)
    ax.set_xlabel('x [m]')
    ax.set_ylabel('y [m]')
    if title:
        ax.set_title(title)
    out = save_path or 'scene_3d.png'
    fig.savefig(out, dpi=120, bbox_inches='tight')
    plt.close(fig)
    return out


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_scores=None,
                ref_labels=None, save_path=None, mode='3d'):
    """Open3D interactive view when available, else the matplotlib 3D
    wireframe render (`mode='3d'`, default) or the BEV plot
    (`mode='bev'`)."""
    try:
        import open3d  # noqa: F401
        return _draw_scenes_open3d(points, gt_boxes, ref_boxes, ref_scores, ref_labels)
    except ImportError:
        if mode == 'bev':
            return draw_scenes_bev(points, gt_boxes, ref_boxes, ref_scores,
                                   ref_labels,
                                   save_path=save_path or 'scene_bev.png')
        return draw_scenes_3d(points, gt_boxes, ref_boxes, ref_scores,
                              ref_labels,
                              save_path=save_path or 'scene_3d.png')


def _draw_scenes_open3d(points, gt_boxes, ref_boxes, ref_scores, ref_labels):
    import open3d as o3d
    vis = o3d.visualization.Visualizer()
    vis.create_window()
    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(np.asarray(points)[:, :3])
    vis.add_geometry(pc)

    def add_boxes(boxes, color):
        for b in np.asarray(boxes):
            obb = o3d.geometry.OrientedBoundingBox(
                b[:3], o3d.geometry.get_rotation_matrix_from_xyz((0, 0, b[6])),
                b[3:6])
            obb.color = color
            vis.add_geometry(obb)

    if gt_boxes is not None:
        add_boxes(gt_boxes, (0, 1, 0))
    if ref_boxes is not None:
        add_boxes(ref_boxes, (1, 0, 0))
    vis.run()
    vis.destroy_window()
