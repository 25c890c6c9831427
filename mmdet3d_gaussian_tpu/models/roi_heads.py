"""PV-RCNN RoI stage: semantic mask head, RoI-grid pooling, bbox head.

TPU-native redesign of the reference RoI stack
(``/root/reference/mmdet3d_gaussian/models/roi_heads/``):

* :class:`PointwiseMaskHead` — keypoint FG segmentation
  (``mask_heads/pointwise_mask_head.py:13-144``): targets via point-in-box
  on enlarged boxes with an ignore ring, focal loss with pos-normalized
  weights.  Dynamic ``multi_apply`` per sample becomes a vmapped pure fn.
* :class:`Batch3DRoIGridExtractor` — 6x6x6 grid points per rotated RoI
  pooled from (seg-score-weighted) keypoints by GuidedSAModuleMSG
  (``roi_extractors/batch_roigrid_extractor.py:10-71``).
* :class:`PVRCNNBboxHead` — shared FCs + cls/reg branches on flattened grid
  features; IoU-interval classification target, RoI-canonical box encoding
  with yaw flip/clamp, optional flip-min Huber corner loss
  (``bbox_heads/pvrcnn_bbox_head.py:17-477``).
* :func:`assign_and_sample` — the reference's per-class MaxIoU (exact 3D
  IoU) + ``IoUNegPiecewiseSampler`` (``pvrcnn_roi_head.py:225-297``) as a
  static-shape ranked selection: positives first, then hard negatives
  (IoU in [hard_thr, pos_thr)), then easy — fixed 128 slots with masks
  (deterministic ranking replaces torch's random choice inside each group).

Everything works on padded per-sample arrays; batch via vmap of pure fns;
flax modules only ever see batched tensors.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.bbox.coders import DeltaXYZWLHRBBoxCoder
from ..core.bbox.structures import (corners_3d, points_in_boxes_3d,
                                    rotation_3d_in_axis)
from ..ops.rotated_iou import iou_3d
from ..registry import LOSSES, MODELS
from .middle_encoders import GuidedSAModuleMSG
from .voxel_encoders import MaskedBatchNorm


# ---------------------------------------------------------------------------
# semantic head
# ---------------------------------------------------------------------------
@MODELS.register_module()
class PointwiseMaskHead(nn.Module):
    in_channels: int = 640
    num_classes: int = 3
    mlps: Sequence[int] = (256, 256)
    extra_width: float = 0.2
    class_agnostic: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        y = feats
        for i, ch in enumerate(self.mlps):
            y = nn.Dense(ch, use_bias=False, name=f'mlp{i}')(y)
            y = MaskedBatchNorm(axis_name=self.axis_name, name=f'bn{i}')(
                y, use_running_average=not train)
            y = nn.relu(y)
        out = 1 if self.class_agnostic else self.num_classes
        return nn.Dense(out, name='seg_out')(y)   # logits (..., out)

    def get_targets(self, keypoints, gt_bboxes, gt_labels, gt_valid):
        """keypoints (B, M, 3); padded gts.  Returns seg targets (B, M)
        int32: class id, num_classes = bg, -1 = ignore ring."""

        def single(kp, boxes, labels, valid):
            enlarged = boxes.at[:, 3:6].add(2 * self.extra_width)
            # the enlarged box keeps the gravity center: bottom z shifts down
            enlarged = enlarged.at[:, 2].add(-self.extra_width)
            inside = points_in_boxes_3d(kp, boxes) & valid[None, :]
            inside_enl = points_in_boxes_3d(kp, enlarged) & valid[None, :]
            fg = jnp.any(inside, -1)
            ring = jnp.any(inside_enl, -1) & ~fg
            first = jnp.argmax(inside, -1)
            tgt = jnp.where(fg, labels[first], self.num_classes)
            return jnp.where(ring, -1, tgt).astype(jnp.int32)

        return jax.vmap(single)(keypoints, gt_bboxes, gt_labels, gt_valid)

    def loss(self, seg_logits, seg_targets, loss_seg):
        """Focal loss with pos-normalized weights (reference ``loss``,
        ``pointwise_mask_head.py:124-144``)."""
        flat = seg_logits.reshape(-1, seg_logits.shape[-1])
        tgt = seg_targets.reshape(-1)
        pos_mask = (tgt > -1) & (tgt < self.num_classes)
        neg = tgt == self.num_classes
        weights = (pos_mask | neg).astype(jnp.float32)
        weights = weights / jnp.clip(jnp.sum(pos_mask), 1.0)
        if self.class_agnostic:
            cls_tgt = jnp.where(pos_mask, 0, 1)   # 1 = bg for 1-ch sigmoid
        else:
            cls_tgt = jnp.where(tgt < 0, self.num_classes, tgt)
        return loss_seg(flat, cls_tgt, weights, avg_factor=1.0)


# ---------------------------------------------------------------------------
# RoI grid extractor
# ---------------------------------------------------------------------------
@MODELS.register_module()
class Batch3DRoIGridExtractor(nn.Module):
    in_channels: int = 128
    pool_radius: Sequence[float] = (0.8, 1.6)
    samples: Sequence[int] = (16, 16)
    mlps: Sequence[Sequence[int]] = ((64, 64), (64, 64))
    grid_size: int = 6
    mode: str = 'max'
    axis_name: Optional[str] = None

    def dense_grid_points(self, rois):
        """rois (..., 7) -> (..., G^3, 3) rotated grid points (reference
        ``get_dense_grid_points`` :56-71 — z offset spans the full box from
        the bottom since rois are bottom-centered)."""
        g = self.grid_size
        idx = np.stack(np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                                   indexing='ij'), -1).reshape(-1, 3)
        frac = (jnp.asarray(idx, jnp.float32) + 0.5) / g
        frac = frac.at[:, :2].add(-0.5)                  # xy centered
        local = frac[None, :, :] * rois[..., None, 3:6]
        rot = rotation_3d_in_axis(local, rois[..., None, 6], axis=2)
        return rot + rois[..., None, 0:3]

    @nn.compact
    def __call__(self, keypoint_feats, keypoints, rois, rois_valid,
                 train: bool = False):
        """keypoint_feats (B, M, C); keypoints (B, M, 3); rois (B, R, 7).

        Returns (B, R, G^3 * out_channels)."""
        b, r, _ = rois.shape
        g3 = self.grid_size ** 3
        grid = self.dense_grid_points(rois)              # (B, R, G^3, 3)
        query = grid.reshape(b, r * g3, 3)
        mask = jnp.ones(keypoints.shape[:2], bool)
        sa = GuidedSAModuleMSG(radii=self.pool_radius,
                               nsamples=self.samples, mlps=self.mlps,
                               pool_method=self.mode,
                               axis_name=self.axis_name, name='grid_pool')
        pooled = sa(keypoints, keypoint_feats, query, mask, train)
        c = pooled.shape[-1]
        pooled = pooled.reshape(b, r, g3 * c)
        return pooled * rois_valid[..., None]


# ---------------------------------------------------------------------------
# bbox head
# ---------------------------------------------------------------------------
@MODELS.register_module()
class PVRCNNBboxHead(nn.Module):
    in_channels: int = 128          # per grid-point channels after pooling
    grid_size: int = 6
    num_classes: int = 3
    class_agnostic: bool = True
    shared_fc: Sequence[int] = (256, 256)
    cls_fc: Sequence[int] = (256, 256)
    reg_fc: Sequence[int] = (256, 256)
    dropout: float = 0.3
    code_size: int = 7
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, grid_feats, valid=None, train: bool = False):
        """grid_feats (B, R, G^3*C), valid (B, R) roi mask -> cls
        (B, R, 1), reg (B, R, 7).  BN statistics exclude padded roi rows
        (all-zero invalid rois would otherwise deflate the stats)."""
        y = grid_feats
        rng_ok = self.has_rng('dropout')
        for i, ch in enumerate(self.shared_fc):
            y = nn.Dense(ch, use_bias=False, name=f'shared{i}')(y)
            y = MaskedBatchNorm(axis_name=self.axis_name,
                                name=f'shared_bn{i}')(
                y, mask=valid, use_running_average=not train)
            y = nn.relu(y)
            if i < len(self.shared_fc) - 1 and self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=not (train
                                                                and rng_ok))(y)
        c = y
        for i, ch in enumerate(self.cls_fc):
            c = nn.Dense(ch, use_bias=False, name=f'cls{i}')(c)
            c = MaskedBatchNorm(axis_name=self.axis_name,
                                name=f'cls_bn{i}')(
                c, mask=valid, use_running_average=not train)
            c = nn.relu(c)
            if i == 0 and self.dropout > 0:
                c = nn.Dropout(self.dropout, deterministic=not (train
                                                                and rng_ok))(c)
        cls_out = nn.Dense(1 if self.class_agnostic else self.num_classes,
                           name='cls_out')(c)
        r = y
        for i, ch in enumerate(self.reg_fc):
            r = nn.Dense(ch, use_bias=False, name=f'reg{i}')(r)
            r = MaskedBatchNorm(axis_name=self.axis_name,
                                name=f'reg_bn{i}')(
                r, mask=valid, use_running_average=not train)
            r = nn.relu(r)
            if i == 0 and self.dropout > 0:
                r = nn.Dropout(self.dropout, deterministic=not (train
                                                                and rng_ok))(r)
        reg_out = nn.Dense(self.code_size, name='reg_out')(r)
        return cls_out, reg_out


# ---------------------------------------------------------------------------
# assignment / sampling / targets (pure)
# ---------------------------------------------------------------------------
class RoISamples(NamedTuple):
    rois: jax.Array          # (R, 7)
    roi_labels: jax.Array    # (R,) predicted class of each roi
    gt_of_roi: jax.Array     # (R, 7) matched gt box (garbage if not pos)
    ious: jax.Array          # (R,)
    is_pos: jax.Array        # (R,) bool
    valid: jax.Array         # (R,) bool


def assign_and_sample(proposals, proposal_labels, proposal_valid,
                      gt_bboxes, gt_labels, gt_valid, num_samples: int = 128,
                      pos_iou_thr: float = 0.55, hard_neg_thr: float = 0.1,
                      pos_fraction: float = 0.5) -> RoISamples:
    """Single-sample proposal assignment + piecewise sampling, static shape.

    IoU is exact 3D (the rcnn stage's ``BboxOverlaps3D``); per-class
    restriction = proposal only matches gts of its predicted class.
    """
    iou = iou_3d(proposals, gt_bboxes)                    # (P, G)
    same_cls = proposal_labels[:, None] == gt_labels[None, :]
    iou = jnp.where(same_cls & gt_valid[None, :], iou, 0.0)
    max_iou = jnp.max(iou, -1)
    argmax = jnp.argmax(iou, -1)
    max_iou = jnp.where(proposal_valid, max_iou, -1.0)

    is_pos = max_iou >= pos_iou_thr
    is_hard = (max_iou >= hard_neg_thr) & ~is_pos & proposal_valid
    is_easy = (max_iou >= 0) & (max_iou < hard_neg_thr) & proposal_valid

    # ranked selection: positives (by iou), then hard negs, then easy.
    # Positives beyond the cap are DISCARDED (score -1), matching the
    # reference sampler which draws at most num*pos_fraction positives —
    # demoting them to a mid band would both leak is_pos=True and crowd
    # out negatives.
    max_pos = int(num_samples * pos_fraction)
    pos_rank = jnp.cumsum(is_pos.astype(jnp.int32)) - 1
    kept_pos = is_pos & (pos_rank < max_pos)
    score = jnp.where(kept_pos, 3000.0 + max_iou,
                      jnp.where(is_hard, 2000.0 + max_iou,
                                jnp.where(is_easy, 1000.0 + max_iou, -1.0)))
    score = jnp.where(is_pos & ~kept_pos, -1.0, score)
    _, order = jax.lax.top_k(score, num_samples)
    sel_valid = score[order] > 0

    return RoISamples(
        rois=proposals[order],
        roi_labels=proposal_labels[order],
        gt_of_roi=gt_bboxes[argmax[order]],
        ious=jnp.clip(max_iou[order], 0.0),
        is_pos=kept_pos[order] & sel_valid,
        valid=sel_valid)


def roi_canonical_targets(samples: RoISamples, coder: DeltaXYZWLHRBBoxCoder,
                          cls_pos_thr: float = 0.75,
                          cls_neg_thr: float = 0.25):
    """Reference ``_get_target_single`` (``pvrcnn_bbox_head.py:253-317``)."""
    iou = samples.ious
    label = (iou > cls_pos_thr).astype(jnp.float32)
    interval = (iou >= cls_neg_thr) & (iou <= cls_pos_thr)
    label = jnp.where(interval, iou * 2 - 0.5, label)
    label_weights = samples.valid.astype(jnp.float32)

    rois = samples.rois
    gt = samples.gt_of_roi
    roi_ry = rois[:, 6] % (2 * np.pi)
    ct = gt[:, 0:3] - rois[:, 0:3]
    ct = rotation_3d_in_axis(ct, -roi_ry, axis=2)
    ry = (gt[:, 6] % (2 * np.pi)) - roi_ry
    ry = ry % (2 * np.pi)
    opposite = (ry > np.pi * 0.5) & (ry < np.pi * 1.5)
    ry = jnp.where(opposite, (ry + np.pi) % (2 * np.pi), ry)
    ry = jnp.where(ry > np.pi, ry - 2 * np.pi, ry)
    ry = jnp.clip(ry, -np.pi / 2, np.pi / 2)

    gt_ct = jnp.concatenate([ct, gt[:, 3:6], ry[:, None]], -1)
    rois_anchor = jnp.concatenate(
        [jnp.zeros_like(rois[:, 0:3]), rois[:, 3:6],
         jnp.zeros_like(rois[:, 6:7])], -1)
    bbox_targets = coder.encode(rois_anchor, gt_ct)
    reg_weights = samples.is_pos.astype(jnp.float32)
    return label, label_weights, bbox_targets, reg_weights


def decode_roi_boxes(rois, deltas, coder: DeltaXYZWLHRBBoxCoder):
    """RoI-canonical deltas -> world boxes (reference ``loss`` path that
    rebuilds boxes for the corner loss, ``pvrcnn_bbox_head.py`` loss)."""
    rois_anchor = jnp.concatenate(
        [jnp.zeros_like(rois[..., 0:3]), rois[..., 3:6],
         jnp.zeros_like(rois[..., 6:7])], -1)
    local = coder.decode(rois_anchor, deltas)
    roi_ry = rois[..., 6] % (2 * np.pi)
    xyz = rotation_3d_in_axis(local[..., 0:3], roi_ry, axis=2)
    xyz = xyz + rois[..., 0:3]
    yaw = local[..., 6] + roi_ry
    return jnp.concatenate([xyz, local[..., 3:6], yaw[..., None]], -1)


def corner_loss_lidar(pred_boxes, gt_boxes, delta: float = 1.0):
    """Flip-min Huber corner loss (reference ``get_corner_loss_lidar``,
    ``pvrcnn_bbox_head.py:318-352``) -> (N,)."""
    pc = corners_3d(pred_boxes)
    gc = corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[..., 6].add(np.pi)
    gcf = corners_3d(gt_flip)
    d = jnp.minimum(jnp.linalg.norm(pc - gc, axis=-1),
                    jnp.linalg.norm(pc - gcf, axis=-1))   # (N, 8)
    quad = jnp.minimum(d, delta)
    lin = d - quad
    return jnp.mean(0.5 * quad ** 2 + delta * lin, axis=-1)
