"""Official KITTI difficulty-stratified AP evaluator (native rebuild).

The reference gets its headline numbers (``/root/reference/README.md:7-28``)
from the official KITTI protocol, inherited through upstream mmdet3d:
``KittiDatasetRev`` (``/root/reference/mmdet3d_gaussian/datasets/
kitti_dataset.py:8``) subclasses mmdet3d's ``KittiDataset`` whose
``evaluate`` calls ``kitti_eval`` (mmdet3d ``core/evaluation/kitti_utils/
eval.py``, itself derived from second.pytorch / the official devkit).

This module re-implements that protocol natively:
  * Easy / Moderate / Hard difficulty gating (2D box height, occlusion,
    truncation) applied at evaluation time,
  * neighbouring-class ignores (Van for Car, Person_sitting for Pedestrian),
  * DontCare-region false-positive absorption (image-bbox metric),
  * 41-recall-position score thresholds; AP R11 (every 4th point) and
    AP R40 (points 1..40),
  * metrics: 2D image bbox AP, BEV AP, 3D AP.

Hot loops (per-frame greedy assignment across 41 thresholds) run in C++
(``csrc/eval_ops.cpp::kitti_stats``/``kitti_tp_scores``) via ctypes; a
NumPy mirror provides the fallback and a cross-check oracle for tests.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from . import native

# Canonical class order of the official devkit (index = current_class id).
CLASS_NAMES = ['Car', 'Pedestrian', 'Cyclist', 'Van', 'Person_sitting',
               'Truck']

MIN_HEIGHT = (40.0, 25.0, 25.0)
MAX_OCCLUSION = (0, 1, 2)
MAX_TRUNCATION = (0.15, 0.30, 0.50)
N_SAMPLE_PTS = 41

# (2 overlap settings, 3 metrics, 6 classes) — rows: bbox/bev/3d; columns in
# CLASS_NAMES order.  Setting 0 = strict ("AP@0.70,0.70,0.70"), setting 1 =
# loose ("AP@0.70,0.50,0.50").
_OVERLAP_MODERATE = np.array([[0.7, 0.5, 0.5, 0.7, 0.5, 0.7],
                              [0.7, 0.5, 0.5, 0.7, 0.5, 0.7],
                              [0.7, 0.5, 0.5, 0.7, 0.5, 0.7]])
_OVERLAP_EASY = np.array([[0.7, 0.5, 0.5, 0.7, 0.5, 0.5],
                          [0.5, 0.25, 0.25, 0.5, 0.25, 0.5],
                          [0.5, 0.25, 0.25, 0.5, 0.25, 0.5]])
MIN_OVERLAPS = np.stack([_OVERLAP_MODERATE, _OVERLAP_EASY], axis=0)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------
def image_box_overlap(boxes: np.ndarray, query_boxes: np.ndarray,
                      criterion: int = -1) -> np.ndarray:
    """Axis-aligned 2D overlap. criterion -1: IoU; 0: inter/area(box)."""
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    query_boxes = np.asarray(query_boxes, np.float64).reshape(-1, 4)
    n, k = len(boxes), len(query_boxes)
    if n == 0 or k == 0:
        return np.zeros((n, k), np.float32)
    lt = np.maximum(boxes[:, None, :2], query_boxes[None, :, :2])
    rb = np.minimum(boxes[:, None, 2:], query_boxes[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area1 = ((boxes[:, 2] - boxes[:, 0])
             * (boxes[:, 3] - boxes[:, 1]))[:, None]
    area2 = ((query_boxes[:, 2] - query_boxes[:, 0])
             * (query_boxes[:, 3] - query_boxes[:, 1]))[None, :]
    if criterion == -1:
        denom = area1 + area2 - inter
    elif criterion == 0:
        denom = np.broadcast_to(area1, inter.shape)
    else:
        raise ValueError(criterion)
    return (inter / np.maximum(denom, 1e-7)).astype(np.float32)


def _riou5(b1: np.ndarray, b2: np.ndarray, criterion: int) -> np.ndarray:
    """Rotated 2D overlap on (cx, cy, w, h, yaw) boxes, native or numpy."""
    b1 = np.ascontiguousarray(b1, np.float32).reshape(-1, 5)
    b2 = np.ascontiguousarray(b2, np.float32).reshape(-1, 5)
    if len(b1) == 0 or len(b2) == 0:
        return np.zeros((len(b1), len(b2)), np.float32)
    if native.available():
        lib = native._load()
        out = np.empty((len(b1), len(b2)), np.float32)
        lib.riou5(b1, len(b1), b2, len(b2), criterion, out)
        return out
    from .geometry_np import rotated_intersection_area
    inter = rotated_intersection_area(b1, b2)
    a1 = (b1[:, 2] * b1[:, 3])[:, None]
    a2 = (b2[:, 2] * b2[:, 3])[None, :]
    inter = np.minimum(inter, np.minimum(a1, a2))
    if criterion == -1:
        return (inter / np.maximum(a1 + a2 - inter, 1e-7)).astype(np.float32)
    if criterion == 0:
        return (inter / np.maximum(a1, 1e-7)).astype(np.float32)
    return inter.astype(np.float32)


def bev_box_overlap(boxes: np.ndarray, qboxes: np.ndarray) -> np.ndarray:
    """BEV IoU on camera-frame boxes (x, z, l, w, ry)."""
    return _riou5(boxes, qboxes, -1)


def d3_box_overlap(boxes: np.ndarray, qboxes: np.ndarray) -> np.ndarray:
    """3D IoU on camera-frame boxes (x, y, z, l, h, w, ry).

    y is the box *bottom* (camera y points down); vertical extent is
    [y - h, y].  BEV intersection x height overlap / union, exactly the
    upstream ``d3_box_overlap_kernel``.
    """
    boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
    qboxes = np.asarray(qboxes, np.float64).reshape(-1, 7)
    if len(boxes) == 0 or len(qboxes) == 0:
        return np.zeros((len(boxes), len(qboxes)), np.float32)
    rinc = _riou5(boxes[:, [0, 2, 3, 5, 6]], qboxes[:, [0, 2, 3, 5, 6]],
                  criterion=2).astype(np.float64)
    ymax = np.minimum(boxes[:, 1][:, None], qboxes[:, 1][None, :])
    ymin = np.maximum((boxes[:, 1] - boxes[:, 4])[:, None],
                      (qboxes[:, 1] - qboxes[:, 4])[None, :])
    ih = np.clip(ymax - ymin, 0, None)
    inter = rinc * ih
    vol1 = (boxes[:, 3] * boxes[:, 4] * boxes[:, 5])[:, None]
    vol2 = (qboxes[:, 3] * qboxes[:, 4] * qboxes[:, 5])[None, :]
    inter = np.minimum(inter, np.minimum(vol1, vol2))
    out = inter / np.maximum(vol1 + vol2 - inter, 1e-7)
    out[rinc * ih <= 0] = 0.0
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# protocol pieces
# ---------------------------------------------------------------------------
def clean_data(gt_anno: Dict, dt_anno: Dict, current_class: int,
               difficulty: int):
    """Per-frame gt/det ignore assignment (upstream ``clean_data``).

    Returns (num_valid_gt, ignored_gt int8 (G,), ignored_dt int8 (D,),
    dc_bboxes (NDC, 4)).
    """
    cls_name = CLASS_NAMES[current_class].lower()
    gt_names = [str(n).lower() for n in gt_anno['name']]
    num_gt = len(gt_names)
    num_dt = len(dt_anno['name'])
    ignored_gt = np.empty(num_gt, np.int8)
    dc_bboxes = []
    num_valid_gt = 0
    for i in range(num_gt):
        name = gt_names[i]
        if name == cls_name:
            valid_class = 1
        elif cls_name == 'pedestrian' and name == 'person_sitting':
            valid_class = 0
        elif cls_name == 'car' and name == 'van':
            valid_class = 0
        else:
            valid_class = -1
        height = gt_anno['bbox'][i, 3] - gt_anno['bbox'][i, 1]
        ignore = (gt_anno['occluded'][i] > MAX_OCCLUSION[difficulty]
                  or gt_anno['truncated'][i] > MAX_TRUNCATION[difficulty]
                  or height <= MIN_HEIGHT[difficulty])
        if valid_class == 1 and not ignore:
            ignored_gt[i] = 0
            num_valid_gt += 1
        elif valid_class == 0 or (ignore and valid_class == 1):
            ignored_gt[i] = 1
        else:
            ignored_gt[i] = -1
        if name == 'dontcare':
            dc_bboxes.append(gt_anno['bbox'][i])
    ignored_dt = np.empty(num_dt, np.int8)
    for i in range(num_dt):
        height = dt_anno['bbox'][i, 3] - dt_anno['bbox'][i, 1]
        if height < MIN_HEIGHT[difficulty]:
            ignored_dt[i] = 1
        elif str(dt_anno['name'][i]).lower() == cls_name:
            ignored_dt[i] = 0
        else:
            ignored_dt[i] = -1
    dc = (np.stack(dc_bboxes, 0).astype(np.float32) if dc_bboxes
          else np.zeros((0, 4), np.float32))
    return num_valid_gt, ignored_gt, ignored_dt, dc


def get_thresholds(scores: np.ndarray, num_gt: int,
                   num_sample_pts: int = N_SAMPLE_PTS) -> np.ndarray:
    """Score thresholds at ~evenly spaced recall positions (upstream)."""
    scores = np.sort(np.asarray(scores, np.float64))[::-1]
    current_recall = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)
                and i < len(scores) - 1):
            continue
        thresholds.append(score)
        current_recall += 1.0 / (num_sample_pts - 1.0)
    return np.asarray(thresholds, np.float32)


_NO_DETECTION = -1e7


def _stats_one_np(overlaps, scores, ig_det, ig_gt, dc_overlap, min_overlap,
                  thresh, compute_fp):
    """NumPy mirror of ``csrc kitti_stats_one`` (oracle + fallback)."""
    nd, ng = len(scores), len(ig_gt)
    assigned = np.zeros(nd, bool)
    ignored_threshold = (scores < thresh) if compute_fp \
        else np.zeros(nd, bool)
    tp = fp = fn = 0
    tp_scores = []
    for i in range(ng):
        if ig_gt[i] == -1:
            continue
        det_idx = -1
        valid_detection = _NO_DETECTION
        max_overlap = 0.0
        assigned_ignored_det = False
        for j in range(nd):
            if ig_det[j] == -1 or assigned[j] or ignored_threshold[j]:
                continue
            ov = overlaps[j, i]
            if (not compute_fp and ov > min_overlap
                    and scores[j] > valid_detection):
                det_idx = j
                valid_detection = scores[j]
            elif (compute_fp and ov > min_overlap
                  and (ov > max_overlap or assigned_ignored_det)
                  and ig_det[j] == 0):
                max_overlap = ov
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = False
            elif (compute_fp and ov > min_overlap
                  and valid_detection == _NO_DETECTION and ig_det[j] == 1):
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = True
        if valid_detection == _NO_DETECTION and ig_gt[i] == 0:
            fn += 1
        elif valid_detection != _NO_DETECTION and (ig_gt[i] == 1
                                                   or ig_det[det_idx] == 1):
            assigned[det_idx] = True
        elif valid_detection != _NO_DETECTION:
            tp += 1
            tp_scores.append(scores[det_idx])
            assigned[det_idx] = True
    if compute_fp:
        fp = int(np.sum(~assigned & (ig_det == 0) & ~ignored_threshold))
        nstuff = 0
        if dc_overlap is not None and dc_overlap.shape[1] > 0:
            for i in range(dc_overlap.shape[1]):
                for j in range(nd):
                    if (assigned[j] or ig_det[j] in (-1, 1)
                            or ignored_threshold[j]):
                        continue
                    if dc_overlap[j, i] > min_overlap:
                        assigned[j] = True
                        nstuff += 1
        fp -= nstuff
    return tp, fp, fn, np.asarray(tp_scores, np.float32)


def _tp_scores(overlaps, scores, ig_det, ig_gt, min_overlap):
    if native.available():
        lib = native._load()
        nd, ng = len(scores), len(ig_gt)
        out = np.empty(max(ng, 1), np.float32)
        n = lib.kitti_tp_scores(
            np.ascontiguousarray(overlaps, np.float32),
            np.ascontiguousarray(scores, np.float32),
            np.ascontiguousarray(ig_det, np.int8), nd,
            np.ascontiguousarray(ig_gt, np.int8), ng,
            float(min_overlap), out)
        return out[:n]
    return _stats_one_np(overlaps, scores, ig_det, ig_gt, None,
                         min_overlap, 0.0, False)[3]


def _stats(overlaps, scores, ig_det, ig_gt, dc_overlap, min_overlap,
           thresholds):
    """(T, 3) int array of per-threshold (tp, fp, fn)."""
    nt = len(thresholds)
    if nt == 0:
        return np.zeros((0, 3), np.int64)
    if native.available():
        lib = native._load()
        nd, ng = len(scores), len(ig_gt)
        dc = np.ascontiguousarray(
            dc_overlap if dc_overlap is not None
            else np.zeros((nd, 0), np.float32), np.float32)
        out = np.empty((nt, 3), np.int32)
        lib.kitti_stats(
            np.ascontiguousarray(overlaps, np.float32),
            np.ascontiguousarray(scores, np.float32),
            np.ascontiguousarray(ig_det, np.int8), nd,
            np.ascontiguousarray(ig_gt, np.int8), ng,
            dc, dc.shape[1], float(min_overlap),
            np.ascontiguousarray(thresholds, np.float32), nt, out)
        return out.astype(np.int64)
    rows = [_stats_one_np(overlaps, scores, ig_det, ig_gt, dc_overlap,
                          min_overlap, t, True)[:3] for t in thresholds]
    return np.asarray(rows, np.int64)


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------
def _frame_overlaps(dt_annos: Sequence[Dict], gt_annos: Sequence[Dict],
                    metric: int) -> List[np.ndarray]:
    """Per-frame (D, G) overlap matrices across ALL classes."""
    out = []
    for dt, gt in zip(dt_annos, gt_annos):
        if metric == 0:
            out.append(image_box_overlap(dt['bbox'], gt['bbox']))
        elif metric == 1:
            db = np.concatenate(
                [dt['location'][:, [0, 2]], dt['dimensions'][:, [0, 2]],
                 dt['rotation_y'][:, None]], -1) if len(dt['name']) else \
                np.zeros((0, 5), np.float32)
            gb = np.concatenate(
                [gt['location'][:, [0, 2]], gt['dimensions'][:, [0, 2]],
                 gt['rotation_y'][:, None]], -1) if len(gt['name']) else \
                np.zeros((0, 5), np.float32)
            out.append(bev_box_overlap(db, gb))
        elif metric == 2:
            db = np.concatenate(
                [dt['location'], dt['dimensions'],
                 dt['rotation_y'][:, None]], -1) if len(dt['name']) else \
                np.zeros((0, 7), np.float32)
            gb = np.concatenate(
                [gt['location'], gt['dimensions'],
                 gt['rotation_y'][:, None]], -1) if len(gt['name']) else \
                np.zeros((0, 7), np.float32)
            out.append(d3_box_overlap(db, gb))
        else:
            raise ValueError(metric)
    return out


def eval_class(gt_annos: Sequence[Dict], dt_annos: Sequence[Dict],
               current_classes: Sequence[int],
               difficultys: Sequence[int], metric: int,
               min_overlaps: np.ndarray) -> Dict[str, np.ndarray]:
    """Precision curves for one metric.

    min_overlaps: (num_overlap_settings, num_classes-in-current_classes).
    Returns precision/recall arrays of shape
    (num_class, num_difficulty, num_overlap_settings, N_SAMPLE_PTS).
    """
    assert len(gt_annos) == len(dt_annos)
    num_frames = len(gt_annos)
    overlaps = _frame_overlaps(dt_annos, gt_annos, metric)
    # DontCare overlap (metric 0 only): criterion 0, det-vs-dc.
    if metric == 0:
        dc_all = []
        for dt, gt in zip(dt_annos, gt_annos):
            msk = np.array([str(n).lower() == 'dontcare'
                            for n in gt['name']], bool)
            dc = gt['bbox'][msk] if msk.any() else np.zeros((0, 4),
                                                            np.float32)
            dc_all.append(image_box_overlap(dt['bbox'], dc, criterion=0))
    else:
        dc_all = [None] * num_frames

    num_class = len(current_classes)
    num_diff = len(difficultys)
    num_ov = min_overlaps.shape[0]
    precision = np.zeros((num_class, num_diff, num_ov, N_SAMPLE_PTS))
    recall = np.zeros((num_class, num_diff, num_ov, N_SAMPLE_PTS))

    for m, cls in enumerate(current_classes):
        for d, diff in enumerate(difficultys):
            cleaned = [clean_data(gt_annos[f], dt_annos[f], cls, diff)
                       for f in range(num_frames)]
            total_valid = sum(c[0] for c in cleaned)
            scores_all = [np.asarray(dt_annos[f]['score'], np.float32)
                          for f in range(num_frames)]
            for k in range(num_ov):
                min_ov = float(min_overlaps[k, m])
                tp_scores = [
                    _tp_scores(overlaps[f], scores_all[f], cleaned[f][2],
                               cleaned[f][1], min_ov)
                    for f in range(num_frames)]
                tp_scores = (np.concatenate(tp_scores)
                             if tp_scores else np.zeros(0, np.float32))
                if total_valid == 0:
                    continue
                thresholds = get_thresholds(tp_scores, total_valid)
                if len(thresholds) == 0:
                    continue
                pr = np.zeros((len(thresholds), 3), np.int64)
                for f in range(num_frames):
                    pr += _stats(overlaps[f], scores_all[f], cleaned[f][2],
                                 cleaned[f][1], dc_all[f], min_ov,
                                 thresholds)
                nt = len(thresholds)
                precision[m, d, k, :nt] = pr[:, 0] / np.maximum(
                    pr[:, 0] + pr[:, 1], 1)
                recall[m, d, k, :nt] = pr[:, 0] / np.maximum(
                    pr[:, 0] + pr[:, 2], 1)
                # right-max envelope
                precision[m, d, k] = np.maximum.accumulate(
                    precision[m, d, k][::-1])[::-1]
                recall[m, d, k] = np.maximum.accumulate(
                    recall[m, d, k][::-1])[::-1]
    return dict(precision=precision, recall=recall)


def get_mAP11(precision: np.ndarray) -> np.ndarray:
    return precision[..., ::4].sum(-1) / 11 * 100


def get_mAP40(precision: np.ndarray) -> np.ndarray:
    return precision[..., 1:].sum(-1) / 40 * 100


def kitti_eval(gt_annos: Sequence[Dict], dt_annos: Sequence[Dict],
               current_classes: Sequence[str],
               eval_types: Sequence[str] = ('bbox', 'bev', '3d'),
               ) -> Tuple[Dict[str, float], str]:
    """Full official evaluation.

    gt_annos / dt_annos: per-frame KITTI-format dicts with keys
    name, truncated, occluded, bbox (N,4), dimensions (N,3 l,h,w),
    location (N,3), rotation_y (N,); dt additionally score (N,).
    (gt 'truncated'/'occluded' default to 0 / 0 when missing.)

    Returns (flat result dict, printable report string).
    """
    name2id = {n.lower(): i for i, n in enumerate(CLASS_NAMES)}
    cls_ids = [name2id[str(c).lower()] for c in current_classes]
    min_overlaps = MIN_OVERLAPS[:, :, cls_ids]        # (2, 3, C)
    gt_annos = [_normalize_anno(a) for a in gt_annos]
    dt_annos = [_normalize_anno(a, det=True) for a in dt_annos]
    metric_ids = {'bbox': 0, 'bev': 1, '3d': 2}
    difficultys = [0, 1, 2]
    results: Dict[str, float] = {}
    ap11 = {}
    ap40 = {}
    for et in eval_types:
        mid = metric_ids[et]
        ret = eval_class(gt_annos, dt_annos, cls_ids, difficultys, mid,
                         min_overlaps[:, mid, :])
        # (C, 3 diff, 2 ov)
        ap11[et] = get_mAP11(ret['precision'])
        ap40[et] = get_mAP40(ret['precision'])

    diff_names = ['easy', 'moderate', 'hard']
    ov_names = ['strict', 'loose']
    for et in eval_types:
        for m, cname in enumerate(current_classes):
            for d, dname in enumerate(diff_names):
                for k, kname in enumerate(ov_names):
                    base = f'{cname}_{et}_{dname}_{kname}'
                    results[f'{base}_AP11'] = float(ap11[et][m, d, k])
                    results[f'{base}_AP40'] = float(ap40[et][m, d, k])
        for d, dname in enumerate(diff_names):
            for k, kname in enumerate(ov_names):
                results[f'Overall_{et}_{dname}_{kname}_AP11'] = float(
                    ap11[et][:, d, k].mean())
                results[f'Overall_{et}_{dname}_{kname}_AP40'] = float(
                    ap40[et][:, d, k].mean())

    report = _format_report(current_classes, eval_types, min_overlaps,
                            ap11, ap40)
    return results, report


def _normalize_anno(a: Dict, det: bool = False) -> Dict:
    n = len(a['name'])
    out = dict(a)
    out['name'] = np.asarray(a['name'])
    out['bbox'] = np.asarray(a['bbox'], np.float32).reshape(n, 4) \
        if 'bbox' in a else np.zeros((n, 4), np.float32)
    out['dimensions'] = np.asarray(a['dimensions'],
                                   np.float32).reshape(n, 3)
    out['location'] = np.asarray(a['location'], np.float32).reshape(n, 3)
    out['rotation_y'] = np.asarray(a['rotation_y'], np.float32).reshape(n)
    out['truncated'] = np.asarray(
        a.get('truncated', np.zeros(n)), np.float32).reshape(n)
    out['occluded'] = np.asarray(
        a.get('occluded', np.zeros(n)), np.int32).reshape(n)
    if det:
        out['score'] = np.asarray(a['score'], np.float32).reshape(n)
    return out


def _format_report(classes, eval_types, min_overlaps, ap11, ap40) -> str:
    """mmdet3d-style report: per class, per overlap setting, both
    protocols; plus a README-schema markdown table for 3D and BEV."""
    lines = []
    for k, kname in enumerate(['', ' (loose)']):
        for m, cname in enumerate(classes):
            ovs = '/'.join(f'{min_overlaps[k, metric, m]:.2f}'
                           for metric in range(3))
            lines.append(f'{cname} AP@{ovs}{kname}:')
            for et in eval_types:
                v11 = ap11[et][m, :, k]
                v40 = ap40[et][m, :, k]
                lines.append(f'{et:<4} AP11: '
                             + ', '.join(f'{v:.4f}' for v in v11))
                lines.append(f'{et:<4} AP40: '
                             + ', '.join(f'{v:.4f}' for v in v40))
    # README.md:7-15 schema (3D AP, strict, R11): class x difficulty table.
    for et in ('3d', 'bev'):
        if et not in ap11:
            continue
        lines.append('')
        lines.append(f'| {et.upper()} AP | ' + ' | '.join(
            f'{c}/{d}' for c in classes
            for d in ('Easy', 'Mod', 'Hard'))
            + ' | Ovr/Easy | Ovr/Mod | Ovr/Hard |')
        lines.append('|' + '---|' * (3 * len(classes) + 4))
        row = ['AP11']
        for m in range(len(classes)):
            row += [f'{ap11[et][m, d, 0]:.4f}' for d in range(3)]
        row += [f'{ap11[et][:, d, 0].mean():.4f}' for d in range(3)]
        lines.append('| ' + ' | '.join(row) + ' |')
        row = ['AP40']
        for m in range(len(classes)):
            row += [f'{ap40[et][m, d, 0]:.4f}' for d in range(3)]
        row += [f'{ap40[et][:, d, 0].mean():.4f}' for d in range(3)]
        lines.append('| ' + ' | '.join(row) + ' |')
    return '\n'.join(lines)
