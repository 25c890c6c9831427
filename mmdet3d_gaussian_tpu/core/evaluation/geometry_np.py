"""NumPy rotated-box geometry for evaluation (CPU path).

Counterpart of the reference's C++ eval kernels
(``/root/reference/mmdet3d_gaussian/ops/eval/rbox_utils.hpp`` /
``affinity.cpp``) — but using vectorized Sutherland–Hodgman convex clipping
instead of the reference's vertex-union + Graham-hull construction: polygon A
is clipped successively against the 4 half-planes of box B.  Exact for convex
quads, O(det x gt) fully vectorized, no Python-level loops over pairs.

A C++ fast path (csrc/eval_ops.cpp via ctypes) can override these — see
``mmdet3d_gaussian_tpu/core/evaluation/native.py``.
"""
from __future__ import annotations

import numpy as np


def box_corners_bev(boxes: np.ndarray) -> np.ndarray:
    """(N, 5) (cx, cy, w, h, yaw) -> (N, 4, 2) CCW corners."""
    cx, cy, w, h, yaw = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], \
        boxes[:, 4]
    c, s = np.cos(yaw), np.sin(yaw)
    dx = np.stack([-w, w, w, -w], -1) * 0.5
    dy = np.stack([-h, -h, h, h], -1) * 0.5
    x = cx[:, None] + c[:, None] * dx - s[:, None] * dy
    y = cy[:, None] + s[:, None] * dx + c[:, None] * dy
    return np.stack([x, y], -1)


def _clip_against_edges(poly, valid, nvert, edges_p0, edges_dir):
    """Sutherland–Hodgman: clip padded polygons against 4 half-planes.

    poly: (P, K, 2) vertex ring (padded); valid/nvert track live vertices.
    edges_p0/edges_dir: (P, 4, 2) clip-edge anchor points and directions
    (inside = left of the directed edge).
    Returns clipped (P, K2, 2) + counts. K2 = K + 4 (each convex clip adds
    at most one vertex per edge).
    """
    p, k, _ = poly.shape
    for e in range(4):
        a = edges_p0[:, e][:, None, :]       # (P, 1, 2)
        d = edges_dir[:, e][:, None, :]
        # signed side of each vertex: cross(d, v - a); >=0 = inside
        rel = poly - a
        side = d[..., 0] * rel[..., 1] - d[..., 1] * rel[..., 0]
        inside = side >= -1e-9

        k2 = k + 1
        new_poly = np.zeros((p, k2, 2), poly.dtype)
        new_valid = np.zeros((p, k2), bool)
        new_cnt = np.zeros((p,), np.int32)

        idx = np.arange(k)
        nxt = (idx + 1) % np.maximum(nvert, 1)[:, None]   # (P, K)
        cur_in = inside
        cur_pt = poly
        nxt_pt = np.take_along_axis(poly, nxt[..., None].repeat(2, -1),
                                    axis=1)
        nxt_in = np.take_along_axis(inside, nxt, axis=1)
        vmask = idx[None, :] < nvert[:, None]

        # contribution per edge segment: current vertex if inside (1 pt),
        # plus intersection point if the segment crosses the plane.
        side_cur = side
        side_nxt = np.take_along_axis(side, nxt, axis=1)
        denom = side_cur - side_nxt
        t = side_cur / np.where(np.abs(denom) < 1e-12, 1.0, denom)
        inter = cur_pt + t[..., None] * (nxt_pt - cur_pt)
        crosses = (cur_in != nxt_in) & vmask

        emit_cur = cur_in & vmask
        # output order: for each input vertex i: [cur if in] then
        # [intersection if crossing].  Compute positions via cumsum.
        emit_cnt = emit_cur.astype(np.int32) + crosses.astype(np.int32)
        pos_end = np.cumsum(emit_cnt, axis=1)
        pos_start = pos_end - emit_cnt
        total = pos_end[:, -1] if k > 0 else np.zeros((p,), np.int32)

        rows = np.arange(p)[:, None].repeat(k, 1)
        # place current vertices
        pc = np.where(emit_cur, pos_start, k2 - 1)
        new_poly[rows.ravel(), pc.ravel()] = np.where(
            emit_cur[..., None], cur_pt, 0).reshape(-1, 2)
        ok = emit_cur.ravel()
        new_valid[rows.ravel()[ok], pc.ravel()[ok]] = True
        # place intersections
        pi = np.where(crosses, pos_start + emit_cur.astype(np.int32),
                      k2 - 1)
        sel = crosses.ravel()
        new_poly[rows.ravel()[sel], pi.ravel()[sel]] = inter.reshape(
            -1, 2)[sel]
        new_valid[rows.ravel()[sel], pi.ravel()[sel]] = True

        poly, valid, nvert, k = new_poly, new_valid, total, k2
    return poly, valid, nvert


def rotated_intersection_area(boxes1: np.ndarray,
                              boxes2: np.ndarray) -> np.ndarray:
    """(N, 5) x (M, 5) -> (N, M) exact intersection areas."""
    n, m = len(boxes1), len(boxes2)
    if n == 0 or m == 0:
        return np.zeros((n, m), np.float64)
    c1 = box_corners_bev(boxes1.astype(np.float64))
    c2 = box_corners_bev(boxes2.astype(np.float64))

    # pairwise: tile to (N*M, ...)
    poly = np.repeat(c1, m, axis=0)                        # (NM, 4, 2)
    clip = np.tile(c2, (n, 1, 1))                          # (NM, 4, 2)
    edges_p0 = clip
    edges_dir = np.roll(clip, -1, axis=1) - clip
    nvert = np.full((n * m,), 4, np.int32)
    valid = np.ones((n * m, 4), bool)
    poly, valid, nvert = _clip_against_edges(poly, valid, nvert,
                                             edges_p0, edges_dir)
    # shoelace over the valid ring
    k = poly.shape[1]
    idx = np.arange(k)
    nxt = (idx[None, :] + 1) % np.maximum(nvert, 1)[:, None]
    nxt_pt = np.take_along_axis(poly, nxt[..., None].repeat(2, -1), axis=1)
    cross = poly[..., 0] * nxt_pt[..., 1] - poly[..., 1] * nxt_pt[..., 0]
    cross = np.where(idx[None, :] < nvert[:, None], cross, 0.0)
    area = 0.5 * np.abs(cross.sum(-1))
    area = np.where(nvert >= 3, area, 0.0)
    area = area.reshape(n, m)
    # clamp by both box areas — also kills the degenerate-clip-box case
    # (zero-length clip edges classify every vertex as inside)
    a1 = np.abs(boxes1[:, 2] * boxes1[:, 3]).astype(np.float64)
    a2 = np.abs(boxes2[:, 2] * boxes2[:, 3]).astype(np.float64)
    return np.minimum(np.minimum(area, a1[:, None]), a2[None, :])


def _bev_of(boxes7):
    return np.stack([boxes7[:, 0], boxes7[:, 1], boxes7[:, 3], boxes7[:, 4],
                     boxes7[:, 6]], -1)


def iou_bev(det: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """BEV IoU of 7-dim boxes (reference ``affinity.cpp:51-81``)."""
    b1, b2 = _bev_of(det), _bev_of(gt)
    inter = rotated_intersection_area(b1, b2)
    a1 = (b1[:, 2] * b1[:, 3])[:, None]
    a2 = (b2[:, 2] * b2[:, 3])[None, :]
    return (inter / np.maximum(a1 + a2 - inter, 1e-7)).astype(np.float32)


def iou_3d(det: np.ndarray, gt: np.ndarray,
           z_offset: float = 0.5) -> np.ndarray:
    """3D IoU: BEV polygon overlap x z overlap (reference
    ``affinity.cpp:8-49``).  ``z_offset`` locates the stored z within the box
    height for BOTH det and gt: z_bottom = z + (z_offset - 0.5) * dz, so the
    default 0.5 means bottom-centered boxes."""
    inter_bev = rotated_intersection_area(_bev_of(det), _bev_of(gt))
    z1lo = det[:, 2] + (z_offset - 0.5) * det[:, 5]
    z1hi = z1lo + det[:, 5]
    z2lo = gt[:, 2] + (z_offset - 0.5) * gt[:, 5]
    z2hi = z2lo + gt[:, 5]
    zov = np.maximum(
        np.minimum(z1hi[:, None], z2hi[None, :])
        - np.maximum(z1lo[:, None], z2lo[None, :]), 0.0)
    v1 = (det[:, 3] * det[:, 4] * det[:, 5])[:, None]
    v2 = (gt[:, 3] * gt[:, 4] * gt[:, 5])[None, :]
    inter = np.minimum(np.minimum(inter_bev * zov, v1), v2)
    return (inter / np.maximum(v1 + v2 - inter, 1e-7)).astype(np.float32)


def trans_bev(det: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """BEV center distance (reference ``affinity.cpp:83-105``)."""
    d = det[:, None, :2] - gt[None, :, :2]
    return np.linalg.norm(d, axis=-1).astype(np.float32)
