"""Range/Volume breakdowns + ignore semantics in the flexible evaluator."""
import numpy as np

from mmdet3d_gaussian_tpu.core.evaluation.breakdown import (NoBreakdown,
                                                            RangeBreakdown,
                                                            VolumeBreakdown)
from mmdet3d_gaussian_tpu.core.evaluation.mean_ap import eval_map_flexible


def boxes_at(dists):
    out = np.zeros((len(dists), 7), np.float32)
    out[:, 0] = dists
    out[:, 3:6] = 2.0
    return out


def test_range_breakdown_bins():
    bd = RangeBreakdown(ranges=dict(near=(0, 30), far=(30, 100)),
                        classes=['Car'])
    flags = bd.breakdown(boxes_at([5, 35, 90]), 0)
    np.testing.assert_array_equal(flags, [[True, False, False],
                                          [False, True, True]])
    assert bd.breakdown_names(0) == ['near', 'far']


def test_volume_breakdown():
    bd = VolumeBreakdown(ranges=dict(small=(0, 10), big=(10, 1e6)),
                         classes=['Car'])
    b = boxes_at([5, 5])
    b[0, 3:6] = 1.0      # vol 1
    b[1, 3:6] = 4.0      # vol 64
    flags = bd.breakdown(b, 0)
    np.testing.assert_array_equal(flags, [[True, False], [False, True]])


def test_ignore_excluded_from_flags():
    bd = NoBreakdown(classes=['Car'])
    flags = bd.breakdown(boxes_at([5, 10]), 0,
                         attrs={'ignore': np.array([False, True])})
    np.testing.assert_array_equal(flags, [[True, False]])


def test_eval_with_ignored_gt():
    """A detection matching an ignored GT is neither TP nor FP."""
    gt = boxes_at([5, 50])
    labels = np.zeros(2, np.int64)
    det = np.concatenate([gt, [[0.9], [0.8]] * np.ones((2, 1))], -1)
    annotations = [dict(gt_bboxes=gt, gt_labels=labels,
                        gt_attrs={'ignore': np.array([False, True])})]
    rep = eval_map_flexible(
        [[det.astype(np.float32)]], annotations, match_thrs=[0.5],
        classes=['Car'],
        report_config=[('map', lambda k: k['breakdown'] == 'All')])
    # 1 real gt, found with no preceding FP -> AP = 1
    assert rep['map'] == 1.0
