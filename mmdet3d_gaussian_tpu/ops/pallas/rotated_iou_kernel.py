"""Pallas TPU kernel: tiled pairwise rotated-box IoU.

The XLA path (``ops/rotated_iou.py``) materializes the (N, M, 24, 2)
candidate tensor in HBM — for NMS-sized inputs (1024x1024 pairs) that's
hundreds of MB of traffic.  This kernel computes IoU in (TN, TM) tiles held
entirely in VMEM: corners, the 24-slot candidate set, an odd-even
transposition sort over pseudo-angles, and the shoelace area never leave
on-chip memory.  Pure VPU work, branch-free.

Algorithm identical to ``ops/rotated_iou.py`` (itself the TPU redesign of
the reference ``ops/eval/rbox_utils.hpp`` polygon clipping) except the
ordering key: instead of atan2 we sort by the monotone *pseudo-angle*
p = sign(dy) * (1 - dx / (|dx| + |dy|)), which needs no transcendentals.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 128
_TM = 128
_NCAND = 24
_BIG = 1e9


def _corners(cx, cy, w, h, yaw):
    """Box components -> 4 CCW corner coordinate arrays (lists of arrays)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    hw, hh = 0.5 * w, 0.5 * h
    dx = (-hw, hw, hw, -hw)
    dy = (-hh, -hh, hh, hh)
    xs = [cx + c * dx[i] - s * dy[i] for i in range(4)]
    ys = [cy + s * dx[i] + c * dy[i] for i in range(4)]
    return xs, ys


def _inside(px, py, cx, cy, w, h, yaw):
    """Point in rotated box, all operands broadcastable arrays."""
    dxv = px - cx
    dyv = py - cy
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = c * dxv + s * dyv
    ly = -s * dxv + c * dyv
    return (jnp.abs(lx) <= 0.5 * w + 1e-5) & (jnp.abs(ly) <= 0.5 * h + 1e-5)


def _pseudo_angle(dx, dy):
    """Monotone-in-angle key in (-2, 2], no transcendentals."""
    denom = jnp.abs(dx) + jnp.abs(dy) + 1e-12
    p = 1.0 - dx / denom
    return jnp.where(dy >= 0, p, -p)


def _iou_tile_kernel(a_ref, b_ref, out_ref):
    """a_ref (5, TN), b_ref (5, TM) -> out_ref (TN, TM)."""
    acx = a_ref[0, :][:, None]
    acy = a_ref[1, :][:, None]
    aw = a_ref[2, :][:, None]
    ah = a_ref[3, :][:, None]
    ayaw = a_ref[4, :][:, None]
    bcx = b_ref[0, :][None, :]
    bcy = b_ref[1, :][None, :]
    bw = b_ref[2, :][None, :]
    bh = b_ref[3, :][None, :]
    byaw = b_ref[4, :][None, :]

    ax, ay = _corners(acx, acy, aw, ah, ayaw)     # lists of (TN, 1)
    bx, by = _corners(bcx, bcy, bw, bh, byaw)     # lists of (1, TM)

    shape = (acx + bcx).shape                     # (TN, TM) via broadcast
    cand_x, cand_y, cand_ok = [], [], []

    # A corners inside B
    for i in range(4):
        ok = _inside(ax[i], ay[i], bcx, bcy, bw, bh, byaw)
        cand_x.append(jnp.broadcast_to(ax[i], shape))
        cand_y.append(jnp.broadcast_to(ay[i], shape))
        cand_ok.append(ok)
    # B corners inside A
    for j in range(4):
        ok = _inside(bx[j], by[j], acx, acy, aw, ah, ayaw)
        cand_x.append(jnp.broadcast_to(bx[j], shape))
        cand_y.append(jnp.broadcast_to(by[j], shape))
        cand_ok.append(ok)
    # edge-edge intersections
    for i in range(4):
        p_x, p_y = ax[i], ay[i]
        r_x = ax[(i + 1) % 4] - p_x
        r_y = ay[(i + 1) % 4] - p_y
        for j in range(4):
            q_x, q_y = bx[j], by[j]
            s_x = bx[(j + 1) % 4] - q_x
            s_y = by[(j + 1) % 4] - q_y
            rxs = r_x * s_y - r_y * s_x
            safe = jnp.where(jnp.abs(rxs) < 1e-8, 1.0, rxs)
            qp_x = q_x - p_x
            qp_y = q_y - p_y
            t = (qp_x * s_y - qp_y * s_x) / safe
            u = (qp_x * r_y - qp_y * r_x) / safe
            ok = ((jnp.abs(rxs) >= 1e-8) & (t >= -1e-6) & (t <= 1 + 1e-6)
                  & (u >= -1e-6) & (u <= 1 + 1e-6))
            cand_x.append(p_x + t * r_x)
            cand_y.append(p_y + t * r_y)
            cand_ok.append(ok)

    nvalid = sum(o.astype(jnp.float32) for o in cand_ok)
    inv_n = 1.0 / jnp.maximum(nvalid, 1.0)
    ctr_x = sum(jnp.where(o, x, 0.0)
                for x, o in zip(cand_x, cand_ok)) * inv_n
    ctr_y = sum(jnp.where(o, y, 0.0)
                for y, o in zip(cand_y, cand_ok)) * inv_n

    key = [jnp.where(o, _pseudo_angle(x - ctr_x, y - ctr_y), _BIG)
           for x, y, o in zip(cand_x, cand_y, cand_ok)]
    vx = list(cand_x)
    vy = list(cand_y)

    # odd-even transposition sort on the 24 slots (invalid -> +BIG -> last)
    for rnd in range(_NCAND):
        start = rnd % 2
        for i in range(start, _NCAND - 1, 2):
            swap = key[i] > key[i + 1]
            key[i], key[i + 1] = (jnp.where(swap, key[i + 1], key[i]),
                                  jnp.where(swap, key[i], key[i + 1]))
            vx[i], vx[i + 1] = (jnp.where(swap, vx[i + 1], vx[i]),
                                jnp.where(swap, vx[i], vx[i + 1]))
            vy[i], vy[i + 1] = (jnp.where(swap, vy[i + 1], vy[i]),
                                jnp.where(swap, vy[i], vy[i + 1]))

    # collapse invalid slots onto the first (valid) vertex
    first_x, first_y = vx[0], vy[0]
    for i in range(_NCAND):
        ok = key[i] < _BIG
        vx[i] = jnp.where(ok, vx[i], first_x)
        vy[i] = jnp.where(ok, vy[i], first_y)

    area2 = jnp.zeros(shape, jnp.float32)
    for i in range(_NCAND):
        j = (i + 1) % _NCAND
        area2 = area2 + (vx[i] * vy[j] - vy[i] * vx[j])
    inter = 0.5 * jnp.abs(area2)
    inter = jnp.where(nvalid >= 3, inter, 0.0)

    area_a = aw * ah
    area_b = bw * bh
    inter = jnp.minimum(jnp.minimum(inter, area_a), area_b)
    out_ref[:, :] = inter / jnp.maximum(area_a + area_b - inter, 1e-6)


def _pad_boxes_t(boxes, tile):
    """(N, 5) -> transposed (5, N_pad) with degenerate padding boxes."""
    n = boxes.shape[0]
    n_pad = -(-n // tile) * tile
    pad = jnp.zeros((n_pad - n, 5), boxes.dtype)
    # padding boxes sit far away with zero size -> IoU 0 against anything
    pad = pad.at[:, 0].set(1e7)
    return jnp.concatenate([boxes, pad], 0).T, n_pad


@jax.jit
def iou_bev_pallas(boxes1, boxes2):
    """Pairwise rotated BEV IoU via the tiled Pallas kernel.

    boxes: (N, 5) / (M, 5) as (cx, cy, w, h, yaw) -> (N, M) float32.
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    a_t, n_pad = _pad_boxes_t(boxes1.astype(jnp.float32), _TN)
    b_t, m_pad = _pad_boxes_t(boxes2.astype(jnp.float32), _TM)

    out = pl.pallas_call(
        _iou_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=(n_pad // _TN, m_pad // _TM),
        in_specs=[
            pl.BlockSpec((5, _TN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, _TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, _TM), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(a_t, b_t)
    return out[:n, :m]
