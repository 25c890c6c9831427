"""Anchor-GT assignment, vectorized and jit-safe (padded GTs + masks).

* :class:`MaxIoUAssigner` — mmdet MaxIoU semantics as used by every reference
  anchor config (``hv_pointpillars_secfpn_kitti.py:63-85``) with the
  ``BboxOverlapsNearest3D`` calculator (axis-aligned nearest-BEV IoU).
  The torch version loops over GTs for the low-quality match; here that loop
  becomes a masked max over the GT axis (later GT index wins, matching the
  reference loop order).
* :class:`SimOTABEVAssigner` — reference
  ``core/bbox/assigners/sim_ota_3d_assigner.py:10-211``: candidate gating by
  in-box/center-radius, cost = BCE(sqrt score) + 3 * (-log IoU3D), dynamic-k
  from the top-10 IoU sum.  Top-k selections use fixed k with masking.

Assignment codes follow mmdet: per-anchor ``assigned_gt`` is -1 = ignore,
0 = negative, g+1 = matched to gt g.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...registry import BBOX_ASSIGNERS
from .structures import iou_aligned_2d, nearest_bev, points_in_boxes_bev


class AssignResult(NamedTuple):
    assigned_gt: jax.Array   # (A,) int32: -1 ignore / 0 neg / g+1 pos
    max_overlaps: jax.Array  # (A,) float
    labels: jax.Array        # (A,) int32 class label of matched gt, -1 else


def bbox_overlaps_nearest_3d(boxes1, boxes2, mode: str = 'iou'):
    """Axis-aligned nearest-BEV IoU of 7-dim boxes: (N,7)x(M,7) -> (N,M)."""
    return iou_aligned_2d(nearest_bev(boxes1), nearest_bev(boxes2), mode=mode)


@BBOX_ASSIGNERS.register_module()
class MaxIoUAssigner:
    def __init__(self, pos_iou_thr: float, neg_iou_thr: float,
                 min_pos_iou: float = 0.0, ignore_iof_thr: float = -1,
                 gt_max_assign_all: bool = True,
                 iou_calculator: Optional[dict] = None):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.ignore_iof_thr = ignore_iof_thr
        self.gt_max_assign_all = gt_max_assign_all

    def assign(self, anchors, gt_bboxes, gt_labels, gt_valid,
               gt_bboxes_ignore=None, gt_ignore_valid=None) -> AssignResult:
        """anchors (A, 7); gt_bboxes (G, 7) padded; gt_labels (G,) int32;
        gt_valid (G,) bool.  Optional don't-care regions: anchors whose
        intersection-over-foreground with any ignore box exceeds
        ``ignore_iof_thr`` are marked -1 (mmdet ignore semantics)."""
        overlaps = bbox_overlaps_nearest_3d(gt_bboxes, anchors)  # (G, A)
        overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)

        max_ov = jnp.max(overlaps, axis=0)                       # (A,)
        argmax_ov = jnp.argmax(overlaps, axis=0).astype(jnp.int32)

        any_gt = jnp.any(gt_valid)
        # no GT at all: every anchor negative (mmdet: assign all 0)
        assigned = jnp.full(anchors.shape[:1], -1, jnp.int32)
        assigned = jnp.where(max_ov < self.neg_iou_thr, 0, assigned)
        assigned = jnp.where(max_ov >= self.pos_iou_thr, argmax_ov + 1,
                             assigned)

        if self.gt_max_assign_all:
            gt_max = jnp.max(overlaps, axis=1, keepdims=True)    # (G, 1)
            eligible = ((overlaps == gt_max)
                        & (gt_max >= self.min_pos_iou)
                        & gt_valid[:, None])                     # (G, A)
            g_ids = jnp.arange(overlaps.shape[0],
                               dtype=jnp.int32)[:, None] + 1
            lq = jnp.max(jnp.where(eligible, g_ids, 0), axis=0)  # (A,)
            assigned = jnp.where(lq > 0, lq, assigned)

        assigned = jnp.where(any_gt, assigned, 0)

        if (gt_bboxes_ignore is not None and self.ignore_iof_thr > 0):
            iof = bbox_overlaps_nearest_3d(anchors, gt_bboxes_ignore,
                                           mode='iof')          # (A, Gi)
            if gt_ignore_valid is not None:
                iof = jnp.where(gt_ignore_valid[None, :], iof, 0.0)
            in_ignore = jnp.max(iof, axis=1) > self.ignore_iof_thr
            assigned = jnp.where(in_ignore, -1, assigned)

        safe_gt = jnp.clip(assigned - 1, 0)
        # one-hot contraction instead of gt_labels[safe_gt]: scalar gathers
        # from a (G,) table serialize on TPU (~4.6 ms/step each at KITTI
        # scale, one per class); the masked sum vectorizes.
        oh = jax.nn.one_hot(safe_gt, gt_labels.shape[0], dtype=jnp.float32)
        gathered = jnp.sum(oh * gt_labels[None, :].astype(jnp.float32),
                           axis=-1).astype(jnp.int32)
        labels = jnp.where(assigned > 0, gathered, -1)
        return AssignResult(assigned_gt=assigned, max_overlaps=max_ov,
                            labels=labels.astype(jnp.int32))


def assign_per_class_vectorized(anchors_cls, gt_bboxes, gt_labels, gt_valid,
                                assigners) -> AssignResult:
    """MaxIoU assignment with one assigner per anchor-class, vectorized.

    Replaces the per-class python loop (one ``MaxIoUAssigner.assign`` per
    class + stack/reshape of the per-class results — the stacked
    ``(H*W, S, R)`` relayout alone cost ~3.3 ms/step at Waymo scale) with a
    single ``(G, A)`` IoU pass: gt g is only eligible for anchors of class
    ``gt_labels[g]`` (the ``assign_per_class`` semantics of the reference
    configs), and the per-class thresholds become per-ANCHOR constant
    vectors, so one masked max/argmax produces the full assignment in the
    anchors' natural (hw, s, r) order.

    anchors_cls: ``(HW, S, R, 7)``; assigners: length-S sequence of
    :class:`MaxIoUAssigner` (their thresholds are read, their ``assign`` is
    not called).
    """
    hw, s, r, _ = anchors_cls.shape
    flat = anchors_cls.reshape(-1, 7)
    a = hw * s * r
    # trace-time constants (numpy in, numpy out)
    anchor_cls = np.broadcast_to(np.arange(s, dtype=np.int32)[None, :, None],
                                 (hw, s, r)).reshape(-1)
    pos_thr = np.asarray([asn.pos_iou_thr for asn in assigners],
                         np.float32)[anchor_cls]
    neg_thr = np.asarray([asn.neg_iou_thr for asn in assigners],
                         np.float32)[anchor_cls]
    min_thr = np.asarray([asn.min_pos_iou for asn in assigners],
                         np.float32)[anchor_cls]

    overlaps = bbox_overlaps_nearest_3d(gt_bboxes, flat)         # (G, A)
    ok = gt_valid[:, None] & (gt_labels[:, None] == anchor_cls[None, :])
    overlaps = jnp.where(ok, overlaps, -1.0)

    max_ov = jnp.max(overlaps, axis=0)
    argmax_ov = jnp.argmax(overlaps, axis=0).astype(jnp.int32)
    # anchors of a class with no gt have max_ov == -1 -> negative, matching
    # the per-class assigner's no-gt branch
    assigned = jnp.full((a,), -1, jnp.int32)
    assigned = jnp.where(max_ov < neg_thr, 0, assigned)
    assigned = jnp.where(max_ov >= pos_thr, argmax_ov + 1, assigned)

    # low-quality matches (gt_max_assign_all)
    gt_max = jnp.max(overlaps, axis=1, keepdims=True)            # (G, 1)
    eligible = ((overlaps == gt_max) & (gt_max >= min_thr[None, :])
                & ok)
    g_ids = jnp.arange(overlaps.shape[0], dtype=jnp.int32)[:, None] + 1
    lq = jnp.max(jnp.where(eligible, g_ids, 0), axis=0)
    assigned = jnp.where(lq > 0, lq, assigned)

    safe_gt = jnp.clip(assigned - 1, 0)
    oh = jax.nn.one_hot(safe_gt, gt_labels.shape[0], dtype=jnp.float32)
    gathered = jnp.sum(oh * gt_labels[None, :].astype(jnp.float32),
                       axis=-1).astype(jnp.int32)
    labels = jnp.where(assigned > 0, gathered, -1)
    return AssignResult(assigned_gt=assigned, max_overlaps=max_ov,
                        labels=labels.astype(jnp.int32))


@BBOX_ASSIGNERS.register_module()
class SimOTABEVAssigner:
    """SimOTA in BEV (reference ``sim_ota_3d_assigner.py:10-211``), jit-safe.

    Reference semantics, exactly:

    * a prior is a CANDIDATE if its center is inside ANY gt box
      (z-extruded) or within ``center_radius`` (absolute metres, max-norm —
      NOT stride-scaled like mmdet's 2D SimOTA) of ANY gt center
      (``get_in_gt_and_in_center_info``, :157-182); candidates may match
      any gt, not just the one that gated them;
    * cost per (gt, candidate) = ``cls_weight * BCE(sqrt(score), onehot)
      + iou_weight * (-log(iou + eps))``; entries where the prior is inside
      THAT gt's box AND center window are clamped to ``max=match_init``
      (:101-107);
    * dynamic-k = ``clamp(int(sum(top-10 ious)), min=1)`` per gt, lowest-
      cost k candidates matched, multi-matched priors resolved by min cost
      (:184-211) — implemented with fixed-size top-k + rank masking.
    """

    EPS = 1e-8

    def __init__(self, center_radius: float = 0.5, candidate_topk: int = 10,
                 iou_weight: float = 3.0, cls_weight: float = 1.0,
                 match_init: float = 2.0, use_box_gate: bool = True):
        self.center_radius = center_radius
        self.candidate_topk = candidate_topk
        self.iou_weight = iou_weight
        self.cls_weight = cls_weight
        self.match_init = match_init
        self.use_box_gate = use_box_gate

    def assign(self, priors, cls_scores, ious, gt_bboxes, gt_labels,
               gt_valid):
        """priors (A, >=2) = (cx, cy, ...) — only the BEV center is used
        (the reference gates on an absolute radius, not stride units);
        cls_scores (A, C) sigmoid probabilities; ious (G, A) 3D IoU between
        gt and decoded preds; gt (G, ...) padded."""
        num_gt, num_priors = ious.shape

        centers = priors[:, 0:2]
        if self.use_box_gate:
            in_box = points_in_boxes_bev(centers, gt_bboxes).T       # (G, A)
        else:
            in_box = jnp.zeros((num_gt, num_priors), bool)
        in_box = in_box & gt_valid[:, None]
        d = jnp.abs(centers[None, :, :] - gt_bboxes[:, None, 0:2])
        # absolute metric radius, max-norm (reference :171 — no stride scale)
        in_center = (jnp.max(d, axis=-1) < self.center_radius) \
            & gt_valid[:, None]
        # global candidate set: in ANY gt box or center window (:177);
        # candidates can match any gt
        valid = jnp.any(in_box, axis=0) | jnp.any(in_center, axis=0)  # (A,)
        gate = valid[None, :] & gt_valid[:, None]
        strong = in_box & in_center

        onehot = jax.nn.one_hot(gt_labels, cls_scores.shape[-1],
                                dtype=cls_scores.dtype)              # (G, C)
        p = jnp.sqrt(jnp.clip(cls_scores, 1e-7, 1 - 1e-7))           # (A, C)
        bce = -(onehot[:, None, :] * jnp.log(p)[None]
                + (1 - onehot[:, None, :]) * jnp.log(1 - p)[None])
        cls_cost = jnp.sum(bce, axis=-1)                             # (G, A)
        iou_cost = -jnp.log(ious + self.EPS)
        cost = self.cls_weight * cls_cost + self.iou_weight * iou_cost
        # in-box-and-center entries start the auction at match_init (:106)
        cost = jnp.where(strong, jnp.minimum(cost, self.match_init), cost)
        cost = jnp.where(gate, cost, 1e18)

        # dynamic-k per gt over the candidate set
        k = min(self.candidate_topk, num_priors)
        top_ious = jax.lax.top_k(jnp.where(gate, ious, 0.0), k)[0]   # (G, k)
        dynamic_k = jnp.clip(jnp.sum(top_ious, axis=-1).astype(jnp.int32),
                             1, None)                                 # (G,)

        # take the dynamic_k lowest-cost candidates per gt
        neg_cost, idx = jax.lax.top_k(-cost, k)                      # (G, k)
        rank_ok = jnp.arange(k)[None, :] < dynamic_k[:, None]
        valid_pick = rank_ok & (-neg_cost < 1e17) & gt_valid[:, None]
        matching = jnp.zeros((num_gt, num_priors), bool)
        matching = matching.at[
            jnp.repeat(jnp.arange(num_gt), k), idx.reshape(-1)].max(
            valid_pick.reshape(-1))

        # resolve priors matched to multiple gts: keep min cost
        multi = jnp.sum(matching, axis=0) > 1
        best_gt = jnp.argmin(jnp.where(matching, cost, 1e18), axis=0)
        keep = (jnp.arange(num_gt)[:, None] == best_gt[None, :])
        matching = jnp.where(multi[None, :], matching & keep, matching)

        fg = jnp.any(matching, axis=0)
        matched_gt = jnp.argmax(matching, axis=0).astype(jnp.int32)
        assigned = jnp.where(fg, matched_gt + 1, 0)
        labels = jnp.where(fg, gt_labels[matched_gt], -1).astype(jnp.int32)
        # unmatched priors carry the reference's -INF sentinel (:116-118),
        # not 0.0 — consumers thresholding max_overlaps rely on it
        max_iou = jnp.where(fg, jnp.max(jnp.where(matching, ious, 0.0),
                                        axis=0), -float(1e8))
        return AssignResult(assigned_gt=assigned, max_overlaps=max_iou,
                            labels=labels)
