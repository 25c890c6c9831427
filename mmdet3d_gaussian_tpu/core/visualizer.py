"""Result visualization: .obj dumps + optional open3d interactive view.

Re-provision of the reference visual debug tooling
(``core/visualizer/show_result.py:1-122`` writes mesh/obj files;
``open3d_vis.py`` renders interactively).  This image has no display/open3d,
so the file-dump path is primary; the open3d path is gated on import.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import numpy as np

from .bbox.structures import corners_3d as _corners_3d


def _write_points_obj(points: np.ndarray, path: str):
    with open(path, 'w') as f:
        for p in points:
            f.write(f'v {p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n')


_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
              (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]


def _write_boxes_obj(boxes: np.ndarray, path: str):
    """Boxes as wireframe line elements."""
    import jax.numpy as jnp
    corners = np.asarray(_corners_3d(jnp.asarray(boxes)))
    with open(path, 'w') as f:
        for box in corners:
            for c in box:
                f.write(f'v {c[0]:.4f} {c[1]:.4f} {c[2]:.4f}\n')
        for i in range(len(corners)):
            base = i * 8
            for a, b in _BOX_EDGES:
                f.write(f'l {base + a + 1} {base + b + 1}\n')


def show_result(points: Optional[np.ndarray],
                gt_bboxes: Optional[np.ndarray],
                pred_bboxes: Optional[np.ndarray],
                out_dir: str, filename: str, show: bool = False):
    """Dump (points, gt boxes, pred boxes) as .obj files (reference
    ``show_result``); optionally open an open3d window when available."""
    result_path = osp.join(out_dir, filename)
    os.makedirs(result_path, exist_ok=True)
    if points is not None:
        _write_points_obj(np.asarray(points),
                          osp.join(result_path, f'{filename}_points.obj'))
    if gt_bboxes is not None and len(gt_bboxes):
        _write_boxes_obj(np.asarray(gt_bboxes),
                         osp.join(result_path, f'{filename}_gt.obj'))
    if pred_bboxes is not None and len(pred_bboxes):
        _write_boxes_obj(np.asarray(pred_bboxes),
                         osp.join(result_path, f'{filename}_pred.obj'))
    if show:
        try:
            show_open3d(points, gt_bboxes, pred_bboxes)
        except ImportError:
            pass
    return result_path


def show_open3d(points, gt_bboxes=None, pred_bboxes=None):
    """Interactive open3d view (reference ``open3d_vis.py``); requires
    open3d + a display."""
    import open3d as o3d  # noqa: raises ImportError when absent
    geoms = []
    if points is not None:
        pc = o3d.geometry.PointCloud(
            points=o3d.utility.Vector3dVector(
                np.asarray(points)[:, :3].astype(np.float64)))
        geoms.append(pc)
    import jax.numpy as jnp
    for boxes, color in ((gt_bboxes, (0, 1, 0)), (pred_bboxes, (1, 0, 0))):
        if boxes is None or not len(boxes):
            continue
        corners = np.asarray(_corners_3d(jnp.asarray(boxes)))
        for box in corners:
            ls = o3d.geometry.LineSet(
                points=o3d.utility.Vector3dVector(box.astype(np.float64)),
                lines=o3d.utility.Vector2iVector(np.asarray(_BOX_EDGES)))
            ls.paint_uniform_color(color)
            geoms.append(ls)
    o3d.visualization.draw_geometries(geoms)
