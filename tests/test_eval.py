"""Evaluation stack tests: rotated IoU (3 implementations cross-checked),
COCO matcher semantics, AP computation, full eval_map_flexible."""
import numpy as np
import pytest

from mmdet3d_gaussian_tpu.core.evaluation import geometry_np as G
from mmdet3d_gaussian_tpu.core.evaluation import native
from mmdet3d_gaussian_tpu.core.evaluation.matcher import match_coco_np
from mmdet3d_gaussian_tpu.core.evaluation.mean_ap import (average_precision,
                                                          eval_map_flexible)


def random_boxes7(n, seed):
    rng = np.random.RandomState(seed)
    return np.c_[rng.uniform(-20, 20, (n, 2)), rng.uniform(-2, 0, (n, 1)),
                 rng.uniform(0.5, 4, (n, 3)),
                 rng.uniform(-np.pi, np.pi, (n, 1))].astype(np.float32)


# ---------------------------------------------------------------- IoU
def test_identical_boxes_iou_one():
    b = random_boxes7(10, 0)
    iou = G.iou_bev(b, b)
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)
    iou3 = G.iou_3d(b, b)
    np.testing.assert_allclose(np.diag(iou3), 1.0, atol=1e-5)


def test_disjoint_boxes_iou_zero():
    a = np.array([[0, 0, 0, 2, 2, 2, 0.3]], np.float32)
    b = np.array([[10, 10, 0, 2, 2, 2, 1.0]], np.float32)
    assert G.iou_bev(a, b)[0, 0] == 0.0
    assert G.iou_3d(a, b)[0, 0] == 0.0


def test_axis_aligned_known_value():
    # two unit squares overlapping half
    a = np.array([[0, 0, 0, 1, 1, 1, 0.0]], np.float32)
    b = np.array([[0.5, 0, 0, 1, 1, 1, 0.0]], np.float32)
    np.testing.assert_allclose(G.iou_bev(a, b)[0, 0], 0.5 / 1.5, atol=1e-5)


def test_rotated_45_known_value():
    # unit square vs same square rotated 45deg: inter = 2*(sqrt2-1)
    a = np.array([[0, 0, 0, 1, 1, 1, 0.0]], np.float32)
    b = np.array([[0, 0, 0, 1, 1, 1, np.pi / 4]], np.float32)
    inter = 2 * (np.sqrt(2) - 1)
    np.testing.assert_allclose(G.iou_bev(a, b)[0, 0], inter / (2 - inter),
                               atol=1e-4)


def test_z_overlap():
    a = np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32)
    b = np.array([[0, 0, 1, 2, 2, 2, 0.0]], np.float32)  # half z overlap
    np.testing.assert_allclose(G.iou_3d(a, b)[0, 0], 4.0 / 12.0, atol=1e-5)


@pytest.mark.skipif(not native.available(), reason='no C++ toolchain')
def test_native_matches_numpy():
    det = random_boxes7(64, 1)
    gt = random_boxes7(32, 2)
    np.testing.assert_allclose(native.iou_bev(det, gt), G.iou_bev(det, gt),
                               atol=1e-5)
    np.testing.assert_allclose(native.iou_3d(det, gt, 0.5),
                               G.iou_3d(det, gt, 0.5), atol=1e-5)


def test_jax_rotated_iou_matches_numpy():
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.ops.rotated_iou import iou_bev as jiou_bev
    det = random_boxes7(16, 3)
    gt = random_boxes7(8, 4)
    bev_d = np.c_[det[:, 0:2], det[:, 3:5], det[:, 6:7]]
    bev_g = np.c_[gt[:, 0:2], gt[:, 3:5], gt[:, 6:7]]
    got = np.asarray(jiou_bev(jnp.asarray(bev_d), jnp.asarray(bev_g)))
    want = G.iou_bev(det, gt)
    np.testing.assert_allclose(got, want, atol=2e-4)


# ---------------------------------------------------------------- matcher
def test_matcher_greedy_order():
    # det0 (higher score, first row) takes gt0; det1 falls to gt1
    cost = np.array([[0.1, 0.2], [0.15, 0.4]], np.float32)
    m = match_coco_np(cost, np.array([0.5], np.float32),
                      np.zeros(2, bool), np.zeros(2, bool))
    np.testing.assert_array_equal(m, [[0, 1]])
    # det1's only remaining option above threshold -> unmatched
    cost2 = np.array([[0.1, 0.2], [0.15, 0.9]], np.float32)
    m2 = match_coco_np(cost2, np.array([0.5], np.float32),
                       np.zeros(2, bool), np.zeros(2, bool))
    np.testing.assert_array_equal(m2, [[0, -1]])


def test_matcher_threshold():
    cost = np.array([[0.6]], np.float32)
    m = match_coco_np(cost, np.array([0.5, 0.7], np.float32),
                      np.zeros(1, bool), np.zeros(1, bool))
    np.testing.assert_array_equal(m, [[-1], [0]])


def test_matcher_ignore_upgrade():
    # det first matches ignore gt0 at lower cost, must upgrade to real gt1
    cost = np.array([[0.1, 0.4]], np.float32)
    ig = np.array([True, False])
    m = match_coco_np(cost, np.array([0.5], np.float32), ig,
                      np.zeros(2, bool))
    np.testing.assert_array_equal(m, [[1]])


@pytest.mark.skipif(not native.available(), reason='no C++ toolchain')
def test_matcher_native_matches_numpy():
    rng = np.random.RandomState(5)
    cost = rng.rand(40, 25).astype(np.float32)
    ig = rng.rand(25) < 0.2
    thrs = np.array([0.3, 0.5, 0.7], np.float32)
    a = match_coco_np(cost, thrs, ig, np.zeros(25, bool))
    b = native.match_coco_native(cost, thrs, ig, np.zeros(25, bool))
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------- AP / e2e
def test_average_precision_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert average_precision(rec, prec) == pytest.approx(1.0)


def test_eval_map_flexible_perfect_detections():
    classes = ['Car', 'Pedestrian']
    gt = random_boxes7(10, 6)
    labels = np.array([0] * 5 + [1] * 5)
    dets = []
    for c in range(2):
        boxes = gt[labels == c]
        scores = np.linspace(0.9, 0.5, len(boxes))[:, None]
        dets.append(np.concatenate([boxes, scores], -1).astype(np.float32))
    annotations = [dict(gt_bboxes=gt, gt_labels=labels, gt_attrs={})]
    report = eval_map_flexible(
        [dets], annotations, match_thrs=[0.5, 0.7], classes=classes,
        report_config=[('map', lambda x: x['breakdown'] == 'All')])
    assert report['map'] == pytest.approx(1.0)


def test_eval_map_flexible_with_fp_and_breakdown():
    classes = ['Car']
    gt = random_boxes7(4, 7)
    gt[:, 0:2] = np.array([[5, 0], [15, 0], [35, 0], [55, 0]])
    labels = np.zeros(4, np.int64)
    # detections: the 4 GTs (high score) + 2 far FPs (low score)
    fp = random_boxes7(2, 8)
    fp[:, 0:2] += 200
    det = np.concatenate([gt, fp], 0)
    scores = np.array([0.9, 0.85, 0.8, 0.75, 0.6, 0.55])[:, None]
    dets = [np.concatenate([det, scores], -1).astype(np.float32)]
    annotations = [dict(gt_bboxes=gt, gt_labels=labels, gt_attrs={})]
    report = eval_map_flexible(
        [dets], annotations, match_thrs=[0.5], classes=classes,
        breakdowns=[dict(type='RangeBreakdown',
                         ranges=dict(D0_30=(0, 30), D30_50=(30, 50)))],
        report_config=[
            ('map', lambda x: x['breakdown'] == 'All'),
            ('map_near', lambda x: x['breakdown'] == 'D0_30'),
        ])
    # all GTs found before any FP -> AP 1.0 in every breakdown
    assert report['map'] == pytest.approx(1.0)
    assert report['map_near'] == pytest.approx(1.0)
