"""Box coders, pure JAX.

* :class:`DeltaXYZWLHRBBoxCoder` — the anchor-delta coder the reference GD
  anchor head decodes through (config ``hv_pointpillars_secfpn_kitti.py:51``;
  decode called at ``gd_anchor3d_head.py:133-136``).  mmdet3d semantics:
  xy normalized by the BEV diagonal, z by height, log-dims, raw yaw delta,
  with z measured at box *center* (za shifted by ha/2).
* :class:`CenterPointBBoxCoder` — CenterPoint head coder
  (reference ``core/bbox/coders/centerpoint_bbox_coders.py:7-112``).
* :class:`CenterPointBBoxYawCoder` — raw-yaw + separate sin/cos direction
  branch with the pi/2-snap trick
  (reference ``centerpoint_bbox_yaw_coders.py:8-56``).
* direction-classifier targets (mmdet3d ``get_direction_target`` semantics,
  used with ``dir_offset=-pi/2`` at ``gd_anchor3d_head.py:29``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...registry import BBOX_CODERS
from .structures import limit_period


@BBOX_CODERS.register_module()
class DeltaXYZWLHRBBoxCoder:
    """(xa..7a, xg..7g) <-> normalized deltas; supports extra velocity dims."""

    def __init__(self, code_size: int = 7):
        self.code_size = code_size

    def encode(self, anchors, gt):
        xa, ya, za, wa, la, ha, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xg, yg, zg, wg, lg, hg, rg = jnp.split(gt[..., :7], 7, axis=-1)
        za = za + ha / 2
        zg = zg + hg / 2
        diag = jnp.sqrt(la ** 2 + wa ** 2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / ha
        lt = jnp.log(lg / la)
        wt = jnp.log(wg / wa)
        ht = jnp.log(hg / ha)
        rt = rg - ra
        extras = []
        if gt.shape[-1] > 7:
            extras = [gt[..., 7:] - anchors[..., 7:]]
        return jnp.concatenate([xt, yt, zt, wt, lt, ht, rt] + extras, axis=-1)

    def decode(self, anchors, deltas):
        xa, ya, za, wa, la, ha, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xt, yt, zt, wt, lt, ht, rt = jnp.split(deltas[..., :7], 7, axis=-1)
        za = za + ha / 2
        diag = jnp.sqrt(la ** 2 + wa ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * ha + za
        lg = jnp.exp(lt) * la
        wg = jnp.exp(wt) * wa
        hg = jnp.exp(ht) * ha
        rg = rt + ra
        zg = zg - hg / 2
        extras = []
        if deltas.shape[-1] > 7:
            extras = [deltas[..., 7:] + anchors[..., 7:]]
        return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg] + extras, axis=-1)

    def decode_parts(self, anchors, deltas):
        """Component-wise decode: ``anchors``/``deltas`` are length-7
        sequences of same-shape arrays (x, y, z, w, l, h, r).

        TPU rationale: the array-of-structs ``(N, 7)`` layout pads the
        7-lane minor dim to 128 on TPU (18x HBM waste) and the
        split/concat pairs break XLA fusion — materializing every
        intermediate.  Keeping each box component as its own plane keeps
        the whole decode chain elementwise and fully fusible into the
        downstream loss kernel.
        """
        xa, ya, za, wa, la, ha, ra = anchors
        xt, yt, zt, wt, lt, ht, rt = deltas
        za = za + ha / 2
        diag = jnp.sqrt(la ** 2 + wa ** 2)
        lg = jnp.exp(lt) * la
        wg = jnp.exp(wt) * wa
        hg = jnp.exp(ht) * ha
        return (xt * diag + xa, yt * diag + ya, zt * ha + za - hg / 2,
                wg, lg, hg, rt + ra)


def add_sin_difference(pred, target):
    """Replace yaw channel by sin-difference pair (mmdet3d
    ``Anchor3DHead.add_sin_difference``; applied at reference
    ``gd_anchor3d_head.py:152-154``):
    pred_r' = sin(rp)cos(rt), target_r' = cos(rp)sin(rt)."""
    rp, rt = pred[..., 6:7], target[..., 6:7]
    pred = jnp.concatenate(
        [pred[..., :6], jnp.sin(rp) * jnp.cos(rt), pred[..., 7:]], axis=-1)
    target = jnp.concatenate(
        [target[..., :6], jnp.cos(rp) * jnp.sin(rt), target[..., 7:]],
        axis=-1)
    return pred, target


def get_direction_target(anchors, reg_targets, dir_offset=-np.pi / 2,
                         num_bins=2, one_hot=False):
    """Direction-bin class target from gt yaw (anchor yaw + yaw delta)."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
    dir_cls = jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32)
    return jnp.clip(dir_cls, 0, num_bins - 1)


def snap_yaw_to_direction(yaw, dir_sin, dir_cos, dims):
    """Snap a raw regressed yaw to the quadrant indicated by the sin/cos
    direction branch: yaw += round((dir - yaw)/(pi/2)) * pi/2, swapping the
    BEV dims on odd quarter-turns (reference
    ``centerpoint_bbox_yaw_coders.py:41-50`` / ``point_bbox_yaw_coders.py``).
    Shared by both yaw coders so the rule can't diverge."""
    direction = jnp.arctan2(dir_sin, dir_cos)
    num_rot90 = jnp.floor((direction - yaw) / (np.pi / 2) + 0.5)
    yaw = yaw + num_rot90 * (np.pi / 2)
    odd = (jnp.abs(num_rot90) % 2) == 1
    w = jnp.where(odd, dims[..., 1], dims[..., 0])
    l = jnp.where(odd, dims[..., 0], dims[..., 1])
    dims = jnp.stack([w, l, dims[..., 2]], axis=-1)
    return yaw, dims


@BBOX_CODERS.register_module()
class CenterPointBBoxCoder:
    """CenterPoint encode/decode on BEV cells (reference
    ``centerpoint_bbox_coders.py:7-112``).

    encode: fractional in-cell offsets, log dims, sin/cos yaw (+velocity).
    decode: invert against integer cell coords.
    Code layout: (dx, dy, z, log w, log l, log h, sin r, cos r[, vx, vy]).
    """

    def __init__(self, pc_range, voxel_size, out_size_factor: int,
                 code_size: int = 9, post_center_range=None,
                 max_num: int = 500, score_threshold: float = 0.0):
        self.pc_range = tuple(pc_range)
        self.voxel_size = tuple(voxel_size)
        self.out_size_factor = out_size_factor
        self.code_size = code_size
        self.post_center_range = post_center_range
        self.max_num = max_num
        self.score_threshold = score_threshold

    def _cell(self):
        return (self.voxel_size[0] * self.out_size_factor,
                self.voxel_size[1] * self.out_size_factor)

    def encode(self, boxes):
        """boxes (..., 7+) -> (cell_ix, cell_iy, code (..., code_size))."""
        cx, cy = self._cell()
        fx = (boxes[..., 0] - self.pc_range[0]) / cx
        fy = (boxes[..., 1] - self.pc_range[1]) / cy
        ix = jnp.floor(fx).astype(jnp.int32)
        iy = jnp.floor(fy).astype(jnp.int32)
        parts = [
            (fx - ix)[..., None], (fy - iy)[..., None],
            boxes[..., 2:3] + boxes[..., 5:6] * 0.5,   # gravity-center z
            jnp.log(jnp.maximum(boxes[..., 3:6], 1e-7)),
            jnp.sin(boxes[..., 6:7]), jnp.cos(boxes[..., 6:7]),
        ]
        if boxes.shape[-1] > 7:
            parts.append(boxes[..., 7:])
        return ix, iy, jnp.concatenate(parts, axis=-1)

    def decode_cells(self, codes, ix, iy):
        """codes (..., code_size) at integer cells -> boxes (..., 7+)."""
        cx, cy = self._cell()
        x = (codes[..., 0] + ix) * cx + self.pc_range[0]
        y = (codes[..., 1] + iy) * cy + self.pc_range[1]
        dims = jnp.exp(codes[..., 3:6])
        z = codes[..., 2] - dims[..., 2] * 0.5      # back to bottom center
        yaw = jnp.arctan2(codes[..., 6], codes[..., 7])
        parts = [x[..., None], y[..., None], z[..., None], dims,
                 yaw[..., None]]
        if codes.shape[-1] > 8:
            parts.append(codes[..., 8:])
        return jnp.concatenate(parts, axis=-1)


@BBOX_CODERS.register_module()
class CenterPointBBoxYawCoder(CenterPointBBoxCoder):
    """Raw-yaw regression + separate sin/cos *direction* branch.

    Decode snaps the regressed yaw by ``num_rot90 = floor((dir - yaw)/(pi/2)
    + 0.5)`` and swaps w/h on odd rotations — the trick that makes raw-yaw
    Gaussian losses direction-aware (reference
    ``centerpoint_bbox_yaw_coders.py:41-50``).

    Code layout: (dx, dy, z, log w, log l, log h, yaw, sin dir, cos dir, ...).
    """

    def encode(self, boxes):
        ix, iy, base = super().encode(boxes)
        # base: (dx, dy, z, logs(3), sin, cos, extras)
        yaw = boxes[..., 6:7]
        code = jnp.concatenate([base[..., :6], yaw, base[..., 6:8],
                                base[..., 8:]], axis=-1)
        return ix, iy, code

    def decode_cells(self, codes, ix, iy, correct_yaw=True):
        cx, cy = self._cell()
        x = (codes[..., 0] + ix) * cx + self.pc_range[0]
        y = (codes[..., 1] + iy) * cy + self.pc_range[1]
        dims = jnp.exp(codes[..., 3:6])
        z = codes[..., 2] - dims[..., 2] * 0.5
        yaw = codes[..., 6]
        if correct_yaw:
            yaw, dims = snap_yaw_to_direction(yaw, codes[..., 7],
                                              codes[..., 8], dims)
        parts = [x[..., None], y[..., None], z[..., None], dims,
                 yaw[..., None]]
        if codes.shape[-1] > 9:
            parts.append(codes[..., 9:])
        return jnp.concatenate(parts, axis=-1)


@BBOX_CODERS.register_module()
class PointBBoxYawCoder:
    """Anchor-free point-prior coder (reference
    ``point_bbox_yaw_coders.py``): xy = pred * stride + prior center, BEV
    dims scaled by stride (height NOT scaled), z passed through raw, yaw
    snapped against the sin/cos direction branch."""

    def __init__(self, code_size: int = 9):
        self.code_size = code_size

    def encode(self, target_boxes):
        """(..., 7+) -> (..., 9+): box7 + (sin yaw, cos yaw) + extras
        (reference ``encode``)."""
        yaw = target_boxes[..., 6]
        return jnp.concatenate(
            [target_boxes[..., :7], jnp.sin(yaw)[..., None],
             jnp.cos(yaw)[..., None], target_boxes[..., 7:]], axis=-1)

    def decode(self, priors, pred, correct_yaw=True):
        """priors (..., 3) = (cx, cy, stride); pred (..., code_size)."""
        stride = priors[..., 2:3]
        xy = pred[..., 0:2] * stride + priors[..., 0:2]
        z = pred[..., 2]
        dims = jnp.exp(pred[..., 3:6])
        dims = jnp.concatenate([dims[..., :2] * stride, dims[..., 2:]],
                               axis=-1)
        yaw = pred[..., 6]
        if correct_yaw:
            yaw, dims = snap_yaw_to_direction(yaw, pred[..., 7],
                                              pred[..., 8], dims)
        return jnp.concatenate([xy, z[..., None], dims, yaw[..., None],
                                pred[..., 9:]], axis=-1)
