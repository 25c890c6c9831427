"""Golden-fixture tests for the native Waymo OD metric (mAP / mAPH).

Reference protocol: waymo-open-dataset ``detection_metrics`` reached by the
reference through upstream mmdet3d ``WaymoDataset`` ('waymo' metric,
``/root/reference/mmdet3d_gaussian/datasets/waymo_dataset.py:8-13``).
The expected numbers below are hand-computed from the documented rules in
``core/evaluation/waymo_metrics.py`` (see docstring there).
"""
import numpy as np

from mmdet3d_gaussian_tpu.core.evaluation.waymo_metrics import (
    _ap_from_pr, _match_frame, eval_waymo, gt_levels, heading_accuracy,
    score_cutoffs)


def _box(x, yaw=0.0):
    return [x, 0.0, 0.0, 4.0, 2.0, 2.0, yaw]


def test_gt_levels():
    lvl = gt_levels(np.array([0, 2, 0, 0]), np.array([100, 100, 3, 0]))
    np.testing.assert_array_equal(lvl, [1, 2, 2, 0])


def test_heading_accuracy():
    np.testing.assert_allclose(
        heading_accuracy(np.array([0.0, np.pi, np.pi / 2, 3 * np.pi]),
                         np.zeros(4)),
        [1.0, 0.0, 0.5, 0.0], atol=1e-12)


def test_hungarian_beats_greedy():
    # greedy-by-best-iou would match det0->gt0 (0.9) and leave det1
    # unmatched; Hungarian takes det0->gt1 + det1->gt0 (two TPs)
    ious = np.array([[0.9, 0.75],
                     [0.8, 0.0]])
    di, gi = _match_frame(ious, 0.7)
    assert sorted(zip(di, gi)) == [(0, 1), (1, 0)]


def test_score_cutoffs_subsample():
    s = np.linspace(0, 1, 1000)
    c = score_cutoffs(s, 100)
    assert len(c) <= 100 and c[0] == 0.0 and c[-1] == 1.0


def test_ap_from_pr_hand():
    # single point at full recall, precision 1/3 (constant fill)
    assert abs(_ap_from_pr([1 / 3, 0.5, 1.0], [1.0, 1.0, 1.0])
               - 1 / 3) < 1e-9


def test_eval_waymo_golden_scene():
    """One frame, one class (thr 0.7); every number hand-computed.

    GT1 (x=0, 100 pts -> L1); GT2 (x=10, 3 pts -> L2); GT3 (x=20, 0 pts ->
    dropped).  Det A = GT1 flipped yaw pi (IoU 1, heading weight 0,
    score .9); Det B = GT2 exact (score .8); Det C far away (score .7, FP).

    L1 (gts={GT1}):  cutoffs .9/.8/.7 give AP-PR (1,1),(1,.5),(1,1/3) ->
    AP = 1/3; APH numerators all 0 -> APH = 0.
    L2 (gts={GT1,GT2}): AP-PR (.5,1),(1,1),(1,2/3) -> AP = 0.5 + 0.40833...
    = 0.9083333; APH-PR (0,0),(1,1),(1,.5) -> APH = 0.2625.
    """
    dets = [[np.array([
        _box(0.0, np.pi) + [0.9],
        _box(10.0) + [0.8],
        _box(50.0) + [0.7],
    ], np.float32)]]
    anns = [dict(
        gt_bboxes=np.array([_box(0.0), _box(10.0), _box(20.0)], np.float32),
        gt_labels=np.array([0, 0, 0]),
        gt_attrs=dict(difficulty=np.array([0, 0, 0]),
                      num_points_in_gt=np.array([100, 3, 0])),
    )]
    out = eval_waymo(dets, anns, classes=('Car',), logger=False)
    assert abs(out['Car/L1/AP'] - 1 / 3) < 1e-6, out
    assert abs(out['Car/L1/APH'] - 0.0) < 1e-6, out
    assert abs(out['Car/L2/AP'] - 0.90833333) < 1e-6, out
    assert abs(out['Car/L2/APH'] - 0.2625) < 1e-6, out
    assert abs(out['mAP_L2'] - out['Car/L2/AP']) < 1e-12


def test_eval_waymo_dataset_wiring():
    """WaymoDataset.evaluate(metric='waymo') reaches the native metric."""
    from mmdet3d_gaussian_tpu.datasets.other_datasets import WaymoDataset

    class _Stub(WaymoDataset):
        def __init__(self):
            self.CLASSES = ('Car', 'Pedestrian', 'Cyclist')
            self.cat2label = {c: i for i, c in enumerate(self.CLASSES)}
            self._anns = [dict(
                gt_bboxes=np.array([_box(0.0)], np.float32),
                gt_labels=np.array([0]),
                gt_attrs=dict(difficulty=np.array([0]),
                              num_points_in_gt=np.array([10])))]

        def __len__(self):
            return 1

        def get_ann_info(self, i):
            return self._anns[i]

    det_frame = [np.array([_box(0.0) + [0.9]], np.float32),
                 np.zeros((0, 8), np.float32),
                 np.zeros((0, 8), np.float32)]
    out = _Stub().evaluate([det_frame], metric='waymo', logger=False)
    assert abs(out['Car/L1/AP'] - 1.0) < 1e-6
    assert abs(out['Car/L1/APH'] - 1.0) < 1e-6
    assert 'mAPH_L2' in out
