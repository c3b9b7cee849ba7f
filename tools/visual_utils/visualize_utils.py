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


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_scores=None,
                ref_labels=None, save_path=None):
    """Open3D interactive view when available, else BEV png."""
    try:
        import open3d  # noqa: F401
        return _draw_scenes_open3d(points, gt_boxes, ref_boxes, ref_scores, ref_labels)
    except ImportError:
        return draw_scenes_bev(points, gt_boxes, ref_boxes, ref_scores,
                               ref_labels, save_path=save_path or 'scene_bev.png')


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
