"""Flexible COCO-style 3D mAP evaluator (reference
``core/evaluation/mean_ap_flexible.py:17-237``).

Config-built product of affinity calculator x matcher x breakdowns; per-frame
TP/FP statistics, global accumulate -> PR curve -> AP per
(class, breakdown, threshold); named aggregate report via ``report_config``
predicates.  Multiprocessing over frames via ``multiprocessing.Pool``
(the reference uses mmcv ``track_parallel_progress``).
"""
from __future__ import annotations

from collections import OrderedDict
from multiprocessing import Pool
from os import cpu_count
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ...registry import (EVAL_AFFINITY_CALS, EVAL_BREAKDOWNS, EVAL_MATCHERS)
from . import affinity as _affinity  # noqa: F401 (registration)
from . import breakdown as _breakdown  # noqa: F401
from . import matcher as _matcher  # noqa: F401


def average_precision(recalls: np.ndarray, precisions: np.ndarray,
                      mode: str = 'area') -> float:
    """mmdet 'area' AP: precision envelope integrated over recall."""
    recalls = np.asarray(recalls, np.float64)
    precisions = np.asarray(precisions, np.float64)
    if mode == 'area':
        mrec = np.concatenate([[0.0], recalls, [1.0]])
        mpre = np.concatenate([[0.0], precisions, [0.0]])
        mpre = np.maximum.accumulate(mpre[::-1])[::-1]
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
    if mode == '11points':
        ap = 0.0
        for t in np.arange(0, 1.1, 0.1):
            prec = precisions[recalls >= t]
            ap += (prec.max() if prec.size else 0.0) / 11
        return float(ap)
    raise ValueError(mode)


class FlexibleStatisticsEval:
    """See reference ``FlexibleStatisticsEval`` — same statistics protocol."""

    def __init__(self, classes, match_thrs, breakdown, affinity_calculator,
                 matcher, nproc: int = 0):
        self.classes = classes
        self.breakdown = [EVAL_BREAKDOWNS.build(
            {'type': 'NoBreakdown'}, classes=classes)]
        self.breakdown += [EVAL_BREAKDOWNS.build(b, classes=classes)
                           for b in breakdown]
        self.affinity_calculator = EVAL_AFFINITY_CALS.build(
            affinity_calculator)
        self.matcher = EVAL_MATCHERS.build(
            matcher, match_thrs=match_thrs,
            affinity_cost_negate=self.affinity_calculator.LARGER_CLOSER)
        self.nproc = nproc

    # -- per frame ------------------------------------------------------
    def statistics_single(self, inp) -> List[Tuple]:
        det, anno = inp
        tp_score_info = []
        num_cls = len(det)
        num_thr = len(self.matcher.match_thrs)

        gt_bboxes = np.asarray(anno['gt_bboxes'], np.float32).reshape(-1, 7)
        gt_labels = np.asarray(anno['gt_labels']).reshape(-1)
        gt_attrs = anno.get('gt_attrs', {})

        for cls in range(num_cls):
            cls_name = self.classes[cls] if self.classes else cls
            det_cls = np.asarray(det[cls], np.float32).reshape(-1, 8)
            scores = det_cls[:, -1]
            order = scores.argsort()[::-1]
            det_boxes = det_cls[order, :-1]
            det_scores = scores[order]
            num_det = len(det_scores)

            msk = gt_labels == cls
            cls_gt = gt_bboxes[msk]
            cls_attrs = {k: np.asarray(v)[msk] for k, v in gt_attrs.items()}
            ignore_msk = np.asarray(
                cls_attrs.get('ignore', np.zeros(len(cls_gt), bool)), bool)
            num_ignore = int(ignore_msk.sum())
            num_gts = len(cls_gt) - num_ignore

            det_bkd, gt_bkd, bkd_names = [], [], []
            for fun in self.breakdown:
                det_bkd.append(fun.breakdown(det_boxes, cls))
                gt_bkd.append(fun.breakdown(cls_gt, cls, cls_attrs))
                bkd_names += fun.breakdown_names(cls)
            det_bkd = np.concatenate(det_bkd, axis=0)
            gt_bkd = np.concatenate(gt_bkd, axis=0)
            num_bkd = gt_bkd.shape[0]

            tp = np.zeros((num_thr, num_det), bool)
            gt_count = [int(gt_bkd[i].sum()) for i in range(num_bkd)]

            if (num_gts + num_ignore) == 0 or num_det == 0:
                for i in range(num_bkd):
                    tp_score_info.append(
                        (cls_name, bkd_names[i], gt_count[i], det_scores,
                         tp.copy(),
                         np.repeat(det_bkd[i:i + 1], num_thr, axis=0)))
                continue

            affinity = self.affinity_calculator(det_boxes, cls_gt, None)
            for i in range(num_bkd):
                matched = self.matcher(affinity, ~gt_bkd[i], None)
                tp_i = matched > -1
                fp_msk = det_bkd[i:i + 1] & (matched == -1)
                tp_msk = gt_bkd[i][np.clip(matched, 0, None)] & (matched > -1)
                tp_score_info.append(
                    (cls_name, bkd_names[i], gt_count[i], det_scores,
                     tp_i, fp_msk | tp_msk))
        return tp_score_info

    # -- accumulate -----------------------------------------------------
    def statistics_accumulate(self, inp) -> List[Tuple[Dict, Dict]]:
        cls, bkd, num_gt, score, tp, bkd_msk = inp
        out = []
        rank = score.argsort()[::-1]
        tp = tp[:, rank]
        bkd_msk = bkd_msk[:, rank]
        for t, thr in enumerate(self.matcher.match_thrs):
            tpc = tp[t, bkd_msk[t]].cumsum()
            num_det = len(tpc)
            recall = tpc / max(num_gt, 1e-7)
            precision = tpc / np.arange(1, num_det + 1)
            ap = average_precision(recall, precision)
            out.append((dict(class_name=cls, breakdown=bkd,
                             match_threshold=thr),
                        dict(num_det=num_det, num_gt=num_gt,
                             recall=float(recall.max()) if num_det else 0.0,
                             mAP=ap)))
        return out

    def statistics_eval(self, det_results, annotations):
        tasks = list(zip(det_results, annotations))
        if self.nproc > 1:
            with Pool(self.nproc) as pool:
                infos = pool.map(self.statistics_single, tasks, chunksize=16)
        else:
            infos = [self.statistics_single(t) for t in tasks]

        merged = []
        for group in zip(*infos):
            cls, bkd, num_gt, score, tp, bkd_msk = tuple(zip(*group))
            assert len(set(cls)) == 1 and len(set(bkd)) == 1
            merged.append((cls[0], bkd[0], sum(num_gt),
                           np.concatenate(score, 0),
                           np.concatenate(tp, 1),
                           np.concatenate(bkd_msk, 1)))
        results = [self.statistics_accumulate(m) for m in merged]
        return sum(results, [])

    def report(self, eval_result_list, group_by):
        out = OrderedDict()
        for name, cond in group_by:
            vals = [v['mAP'] for k, v in eval_result_list
                    if cond(k) and v['num_gt'] > 0]
            out[name] = float(np.mean(vals)) if vals else float('nan')
        return out


def format_table(eval_result_list) -> str:
    rows = [['Class', 'Breakdown', 'Thres', 'Dets', 'GTs', 'Recall', 'mAP']]
    for k, v in eval_result_list:
        rows.append([str(k['class_name']), str(k['breakdown']),
                     str(k['match_threshold']), str(v['num_det']),
                     str(v['num_gt']), f'{100 * v["recall"]:.3f}',
                     f'{100 * v["mAP"]:.3f}'])
    widths = [max(len(r[i]) for r in rows) for i in range(len(rows[0]))]
    lines = ['  '.join(c.ljust(w) for c, w in zip(r, widths)) for r in rows]
    return '\n'.join(lines)


def eval_map_flexible(det_results, annotations, match_thrs=(0.5,),
                      breakdowns=(), affinity_calculator=None, matcher=None,
                      classes=None, logger=None,
                      report_config=(('map',
                                      lambda x: x['breakdown'] == 'All'),),
                      nproc: Optional[int] = None):
    """Reference ``eval_map_flexible`` (``mean_ap_flexible.py:202-237``).

    det_results: per frame, per class (N, 8) arrays [box7, score].
    annotations: per frame dicts with gt_bboxes (G, 7), gt_labels (G,),
        gt_attrs optional dict of per-gt arrays ('ignore', 'distance', ...).
    """
    assert len(det_results) == len(annotations)
    nproc = 0 if nproc is None else (cpu_count() or 0 if nproc < 0 else nproc)
    fse = FlexibleStatisticsEval(
        classes, list(match_thrs), list(breakdowns),
        affinity_calculator or dict(type='LidarIOU3D'),
        matcher or dict(type='MatcherCoCo'), nproc)
    eval_result_list = fse.statistics_eval(det_results, annotations)
    report = fse.report(eval_result_list, report_config)
    table = format_table(eval_result_list)
    if logger is None:
        print('\n' + table)
    return report
