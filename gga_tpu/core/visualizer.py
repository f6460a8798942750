"""Result visualization.

Matplotlib rebuild of the reference visualizer
(/root/reference/mmdet3d/core/visualizer/): BEV point-cloud plots with
boxes, and 3D-box projection onto images
(show_multi_modality_result equivalents). Headless (Agg) — writes pngs.
"""
from __future__ import annotations

import numpy as np

from . import np_geometry as ng

# edges between the 8 reference-ordered corners
_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def _plt():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def show_bev_result(points, gt_boxes=None, pred_boxes=None, out_file=None,
                    pc_range=(0, -40, 70.4, 40), title=''):
    """BEV scatter + box outlines -> png.

    Args:
        points: [P, >=3] lidar points.
        gt_boxes / pred_boxes: [N, 7] bottom-center lidar boxes.
    """
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 10))
    if points is not None and len(points):
        ax.scatter(points[:, 0], points[:, 1], s=0.3, c='gray', alpha=0.4)

    def draw(boxes, color):
        if boxes is None or len(boxes) == 0:
            return
        corners = ng.center_to_corner_box2d(
            boxes[:, :2], boxes[:, 3:5], boxes[:, 6])
        for c in corners:
            loop = np.concatenate([c, c[:1]])
            ax.plot(loop[:, 0], loop[:, 1], color=color, linewidth=1.2)

    draw(gt_boxes, 'tab:green')
    draw(pred_boxes, 'tab:red')
    ax.set_xlim(pc_range[0], pc_range[2])
    ax.set_ylim(pc_range[1], pc_range[3])
    ax.set_aspect('equal')
    ax.set_title(title or 'BEV (green: GT, red: pred)')
    if out_file:
        fig.savefig(out_file, dpi=120, bbox_inches='tight')
        plt.close(fig)
        return out_file
    return fig


def show_multi_modality_result(img, boxes_cam, proj_mat, out_file=None,
                               color=(0, 1, 0)):
    """Project camera-frame boxes onto an image -> png
    (core/visualizer/show_result.show_multi_modality_result).

    Args:
        img: [H, W, 3] uint8/float image (RGB).
        boxes_cam: [N, 7] camera boxes (bottom-center, yaw about y).
        proj_mat: [4, 4] cam2img.
    """
    plt = _plt()
    fig, ax = plt.subplots(figsize=(12, 4))
    ax.imshow(np.asarray(img).astype(np.uint8))
    if boxes_cam is not None and len(boxes_cam):
        corners = ng.center_to_corner_box3d(
            boxes_cam[:, :3], boxes_cam[:, 3:6], boxes_cam[:, 6],
            origin=(0.5, 1.0, 0.5), axis=1)
        for c in corners:
            pix = ng.project_to_image(c, proj_mat)
            for a, b in _EDGES:
                ax.plot([pix[a, 0], pix[b, 0]], [pix[a, 1], pix[b, 1]],
                        color=color, linewidth=1.0)
    ax.set_axis_off()
    if out_file:
        fig.savefig(out_file, dpi=120, bbox_inches='tight')
        plt.close(fig)
        return out_file
    return fig


def show_result(points, gt_boxes, pred_boxes, out_dir, filename,
                pc_range=(0, -40, 70.4, 40)):
    """Reference show_result contract: writes {filename}_bev.png."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f'{filename}_bev.png')
    return show_bev_result(points, gt_boxes, pred_boxes, out,
                           pc_range=pc_range)


def show_interactive(points, gt_boxes=None, pred_boxes=None,
                     point_colors=None):
    """Interactive 3D viewer (counterpart of the reference's open3d
    visualizer, /root/reference/mmdet3d/core/visualizer/open3d_vis.py:1):
    point cloud + GT (green) / prediction (red) wireframe boxes in an
    open3d window. open3d is external (headless images run the BEV/image
    writers instead); the import is gated at call time."""
    try:
        import open3d as o3d
    except ImportError as e:  # pragma: no cover - open3d not baked in
        raise ImportError(
            'show_interactive needs open3d (pip install open3d); on a '
            'headless machine use show_bev_result / '
            'show_multi_modality_result instead.') from e

    import numpy as np

    from .np_geometry import center_to_corner_box3d

    geoms = []
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(np.asarray(points)[:, :3])
    if point_colors is not None:
        pcd.colors = o3d.utility.Vector3dVector(np.asarray(point_colors))
    geoms.append(pcd)

    # 12 box edges over the 8 corners (same ordering as corners_7dof)
    edges = [[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6], [6, 7],
             [7, 4], [0, 4], [1, 5], [2, 6], [3, 7]]
    for boxes, color in ((gt_boxes, (0, 1, 0)), (pred_boxes, (1, 0, 0))):
        if boxes is None or len(boxes) == 0:
            continue
        b = np.asarray(boxes)
        all_corners = center_to_corner_box3d(b[:, :3], b[:, 3:6],
                                             b[:, 6])
        for corners in all_corners:
            ls = o3d.geometry.LineSet(
                points=o3d.utility.Vector3dVector(corners),
                lines=o3d.utility.Vector2iVector(edges))
            ls.colors = o3d.utility.Vector3dVector([color] * len(edges))
            geoms.append(ls)
    o3d.visualization.draw_geometries(geoms)
