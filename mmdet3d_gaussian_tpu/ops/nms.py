"""NMS variants, static-shape JAX (mask-based suppression).

Replaces the reference's CUDA ``nms_gpu`` rotated NMS (imported at
``models/dense_heads/gd_centerpoint_head.py:9``) and the numpy ``circle_nms``
(CenterPoint).  All functions keep static shapes: candidates are pre-selected
top-k by score, suppression runs as a sequential mask sweep
(``lax.fori_loop``), outputs are fixed-size keep masks — jit/pmap friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotated_iou import iou_bev


def _suppress_sweep(iou_mat, valid, thr):
    """Greedy NMS given a score-sorted pairwise IoU matrix (K, K).

    On TPU the K-step recurrence runs inside one Pallas kernel (on-chip
    loop); elsewhere it is an XLA fori_loop."""
    k = iou_mat.shape[0]
    if jax.default_backend() == 'tpu' and k >= 128:
        from .pallas.nms_kernel import nms_sweep_pallas
        return nms_sweep_pallas(iou_mat, valid, thr)
    suppress = iou_mat > thr

    def body(i, keep):
        keep_i = keep[i]
        kill = suppress[i] & (jnp.arange(k) > i) & keep_i
        return keep & ~kill

    keep0 = valid
    return jax.lax.fori_loop(0, k, body, keep0)


def _pairwise_iou_bev(boxes):
    """Dispatch: Pallas tiled kernel on TPU (VMEM-resident, no (K,K,24,2)
    HBM intermediate), vmapped XLA clip elsewhere."""
    if jax.default_backend() == 'tpu' and boxes.shape[0] >= 128:
        from .pallas.rotated_iou_kernel import iou_bev_pallas
        return iou_bev_pallas(boxes, boxes)
    return iou_bev(boxes, boxes)


def nms_bev(boxes, scores, thr: float, valid=None):
    """Rotated-BEV NMS.

    Args:
        boxes: (K, 5) (cx, cy, w, h, yaw), already sorted by descending
            score (use :func:`topk_sorted` first).
        scores: (K,) descending.
        thr: IoU threshold.
        valid: (K,) bool pre-mask.
    Returns: keep mask (K,).
    """
    if valid is None:
        valid = jnp.ones(boxes.shape[:1], bool)
    iou = _pairwise_iou_bev(boxes)
    return _suppress_sweep(iou, valid, thr)


def nms_normal_bev(boxes, scores, thr: float, valid=None):
    """Axis-aligned NMS on the BEV AABBs of rotated boxes."""
    if valid is None:
        valid = jnp.ones(boxes.shape[:1], bool)
    # AABB of the rotated box
    c, s = jnp.abs(jnp.cos(boxes[:, 4])), jnp.abs(jnp.sin(boxes[:, 4]))
    hw = 0.5 * (boxes[:, 2] * c + boxes[:, 3] * s)
    hh = 0.5 * (boxes[:, 2] * s + boxes[:, 3] * c)
    x1, x2 = boxes[:, 0] - hw, boxes[:, 0] + hw
    y1, y2 = boxes[:, 1] - hh, boxes[:, 1] + hh
    area = (x2 - x1) * (y2 - y1)
    lt_x = jnp.maximum(x1[:, None], x1[None, :])
    lt_y = jnp.maximum(y1[:, None], y1[None, :])
    rb_x = jnp.minimum(x2[:, None], x2[None, :])
    rb_y = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(rb_x - lt_x, 0) * jnp.clip(rb_y - lt_y, 0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-6)
    return _suppress_sweep(iou, valid, thr)


def circle_nms(centers, scores, min_radius: float, valid=None):
    """CenterPoint circle NMS (reference usage ``gd_centerpoint_head.py:256-281``).

    Quirk preserved from mmdet3d's ``circle_nms``: the config value
    ``min_radius`` is compared against the *squared* center distance
    (suppress when ``d^2 < min_radius``), i.e. the effective suppression
    radius is ``sqrt(min_radius)`` metres — it is NOT squared here.
    Inputs sorted by descending score."""
    if valid is None:
        valid = jnp.ones(centers.shape[:1], bool)
    d2 = jnp.sum((centers[:, None, :] - centers[None, :, :]) ** 2, -1)
    return _suppress_sweep(-d2, valid, -min_radius)


def topk_sorted(scores, k: int, *arrays):
    """Top-k by score; returns (scores_k, idx_k, *arrays_k) sorted desc."""
    sk, idx = jax.lax.top_k(scores, k)
    return (sk, idx) + tuple(a[idx] for a in arrays)
