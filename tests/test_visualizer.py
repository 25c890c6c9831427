"""Visualizer .obj dump (reference show_result counterpart)."""
import os

import pytest

import numpy as np

from mmdet3d_gaussian_tpu.core.visualizer import show_result


def test_show_result_writes_objs(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 4).astype(np.float32)
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], np.float32)
    pred = np.array([[1, 1, 0, 4, 2, 1.5, -0.2],
                     [5, 5, 0, 2, 1, 1.0, 0.0]], np.float32)
    out = show_result(pts, gt, pred, str(tmp_path), 'frame0')
    files = os.listdir(out)
    assert 'frame0_points.obj' in files
    assert 'frame0_gt.obj' in files
    assert 'frame0_pred.obj' in files
    # box obj: 8 vertices + 12 edges per box
    lines = open(os.path.join(out, 'frame0_pred.obj')).read().splitlines()
    assert sum(l.startswith('v ') for l in lines) == 16
    assert sum(l.startswith('l ') for l in lines) == 24


def test_box_corners_axis_aligned():
    from mmdet3d_gaussian_tpu.core.visualizer.geometry import box_corners
    box = np.array([[1.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.0]])
    c = box_corners(box)
    assert c.shape == (1, 8, 3)
    # bottom z = box z (lidar_bottom), top z = z + dz
    np.testing.assert_allclose(c[0, :4, 2], 0.5)
    np.testing.assert_allclose(c[0, 4:, 2], 2.0)
    np.testing.assert_allclose(sorted(set(np.round(c[0, :, 0], 6))), [-1, 3])
    np.testing.assert_allclose(sorted(set(np.round(c[0, :, 1], 6))), [1, 3])
    # gravity mode shifts down by dz/2
    cg = box_corners(box, 'gravity')
    np.testing.assert_allclose(cg[0, :, 2], c[0, :, 2] - 0.75)


def test_box_corners_rotation_preserves_shape():
    from mmdet3d_gaussian_tpu.core.visualizer.geometry import box_corners
    box = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, np.pi / 2]])
    c = box_corners(box)[0]
    # 90deg: x extent becomes the 2.0 dim, y extent the 4.0 dim
    assert np.ptp(c[:, 0]) == pytest.approx(2.0)
    assert np.ptp(c[:, 1]) == pytest.approx(4.0)


def test_wireframe_and_outline():
    from mmdet3d_gaussian_tpu.core.visualizer.geometry import (
        bev_outline, box_wireframe)
    boxes = np.array([[0, 0, 0, 4, 2, 1.5, 0.3],
                      [5, 5, 0, 2, 1, 1.0, -0.2]])
    verts, lines = box_wireframe(boxes)
    assert verts.shape == (16, 3) and lines.shape == (28, 2)
    assert lines.max() == 15
    out = bev_outline(boxes)
    assert out.shape == (2, 5, 2)
    np.testing.assert_allclose(out[:, 0], out[:, 4])  # closed polyline


def test_points_in_boxes_mask_and_colors():
    from mmdet3d_gaussian_tpu.core.visualizer.geometry import (
        colorize_points, points_in_boxes_mask)
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    pts = np.array([[0.0, 0.0, 1.0],      # inside
                    [0.9, 0.9, 0.1],      # inside corner
                    [1.5, 0.0, 1.0],      # outside x
                    [0.0, 0.0, 2.5]])     # above top
    mask = points_in_boxes_mask(pts, boxes)
    np.testing.assert_array_equal(mask, [True, True, False, False])
    colors = colorize_points(pts, (0.5, 0.5, 0.5), mask, (1, 0, 0))
    np.testing.assert_allclose(colors[0], [1, 0, 0])
    np.testing.assert_allclose(colors[2], [0.5, 0.5, 0.5])


def test_seg_mask_colors():
    from mmdet3d_gaussian_tpu.core.visualizer.geometry import seg_mask_colors
    pts = np.random.RandomState(0).randn(10, 4)
    labels = np.array([0, 1] * 5)
    out = seg_mask_colors(pts, labels, palette=np.array([[255, 0, 0],
                                                         [0, 255, 0]]))
    assert out.shape == (10, 6)
    np.testing.assert_allclose(out[0, 3:], [1, 0, 0])
    np.testing.assert_allclose(out[1, 3:], [0, 1, 0])


def test_plot_bev_renders(tmp_path):
    from mmdet3d_gaussian_tpu.core.visualizer import (
        plot_assignment_bev, plot_grouping_bev, plot_heatmap_bev)
    rng = np.random.RandomState(0)
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.2], [8, 3, 0, 3, 1.6, 1.4, -0.4]])
    assigned = np.array([1, 2, 0, -1, 1])
    priors = rng.randn(5, 2) * 3
    decoded = np.concatenate([priors, rng.rand(5, 5)], 1)
    p1 = plot_assignment_bev(assigned, priors, decoded, gt,
                             path=str(tmp_path / 'assign.png'))
    p2 = plot_grouping_bev(rng.randn(6, 3), rng.randn(6, 8, 3),
                           empty_mask=np.array([0, 0, 1, 0, 0, 0], bool),
                           path=str(tmp_path / 'group.png'))
    p3 = plot_heatmap_bev(rng.rand(32, 32, 3),
                          path=str(tmp_path / 'hm.png'))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000


def test_open3d_gated_import_error():
    from mmdet3d_gaussian_tpu.core.visualizer import open3d_vis
    try:
        import open3d  # noqa: F401
        pytest.skip('open3d present')
    except ImportError:
        pass
    with pytest.raises(ImportError, match='obj'):
        open3d_vis.Visualizer(np.zeros((4, 3)))
