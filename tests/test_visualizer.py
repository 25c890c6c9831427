"""Visualizer .obj dump (reference show_result counterpart)."""
import os

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
