"""High-level detector engine: build / init / train_step / predict.

The TPU analogue of the reference's detector + runner glue
(``tools/train.py:181-213`` builds model/dataset and hands off to the mmcv
runner; here a :class:`PointPillarsDetector` bundles the flax trunk with the
anchor-head task math and exposes pure jittable functions).

Batch dict contract (all padded, static shapes):
    points      (B, N, C) float32
    points_mask (B, N) bool
    gt_bboxes   (B, G, 7) float32
    gt_labels   (B, G) int32
    gt_valid    (B, G) bool
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dense_heads.anchor3d_head import GDAnchor3DHead
from ..models.detectors.voxelnet import PointPillarsNet
from ..registry import MODELS


KITTI_3CLASS_MODEL = dict(
    voxel_size=(0.16, 0.16, 4.0),
    point_cloud_range=(0., -39.68, -3., 69.12, 39.68, 1.),
    max_points_per_voxel=32,
    max_voxels_per_sample=16000,
    voxelize_mode='hard',
    encoder_cfg=dict(in_channels=4, feat_channels=(64,)),
    backbone_cfg=dict(in_channels=64, out_channels=(64, 128, 256),
                      layer_nums=(3, 5, 5), layer_strides=(2, 2, 2)),
    neck_cfg=dict(in_channels=(64, 128, 256), out_channels=(128, 128, 128),
                  upsample_strides=(1, 2, 4)),
    head_cfg=dict(num_classes=3, num_anchors=6, feat_channels=384),
)

KITTI_3CLASS_HEAD = dict(
    num_classes=3,
    anchor_generator=dict(
        ranges=[
            [0.08, -39.60, -0.6, 68.88, 39.44, -0.6],
            [0.08, -39.60, -0.6, 68.88, 39.44, -0.6],
            [0.08, -39.60, -1.78, 68.88, 39.44, -1.78],
        ],
        sizes=[[0.8, 0.6, 1.73], [1.76, 0.6, 1.73], [3.9, 1.6, 1.56]],
        rotations=[0.0, 1.57],
    ),
    assigners=[
        dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
        dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),
    ],
    loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
                  loss_weight=1.0),
    loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=2.0),
    loss_decoded_bbox=dict(type='GDLoss', loss_type='kld3d',
                           center_offset=(0, 0, 0.5), fun='log1p', tau=1.0,
                           alpha=1.0, loss_weight=5.0),
    loss_dir=dict(type='CrossEntropyLoss', use_sigmoid=False,
                  loss_weight=0.2),
    code_weight=[0., 0., 0., 0., 0., 0., 0.],
    decode_weight=1.0,
    test_cfg=dict(use_rotate_nms=True, nms_thr=0.01, score_thr=0.05,
                  nms_pre=1024, max_num=100),
)


class PointPillarsDetector:
    """PointPillars + GD anchor head (the flagship / north-star config:
    reference ``hv_pointpillars_secfpn_kld5tau1_12x4_160e_kitti-3d-3class``).
    """

    def __init__(self, model_cfg: Optional[Dict[str, Any]] = None,
                 head_cfg: Optional[Dict[str, Any]] = None,
                 axis_name: Optional[str] = None):
        mc = dict(KITTI_3CLASS_MODEL)
        mc.update(model_cfg or {})
        hc = dict(KITTI_3CLASS_HEAD)
        hc.update(head_cfg or {})
        self.trunk = PointPillarsNet(axis_name=axis_name, **mc)
        self.head = GDAnchor3DHead(**hc)
        self.model_cfg = mc
        nx, ny = self.trunk._grid()
        stride = mc['backbone_cfg']['layer_strides'][0]
        self.featmap_size = (ny // stride, nx // stride)
        # computed eagerly at construction: anchors are numpy constants that
        # close over jitted functions (never created inside a trace)
        self.anchors = self.head.anchors_for(self.featmap_size)

    # -- pure functions -------------------------------------------------
    def init(self, rng, batch):
        return self.trunk.init(rng, batch['points'], batch['points_mask'],
                               train=False)

    def apply_train(self, variables, batch):
        (cls, bbox, dirp, packed), aux = self.trunk.apply(
            variables, batch['points'], batch['points_mask'], train=True,
            mutable=['batch_stats'])
        return (cls, bbox, dirp, packed), aux['batch_stats']

    def apply_eval(self, variables, batch):
        return self.trunk.apply(variables, batch['points'],
                                batch['points_mask'], train=False)

    def loss(self, outputs, batch):
        cls, bbox, dirp, packed = outputs
        targets = jax.vmap(self.head.get_targets, in_axes=(None, 0, 0, 0))(
            self.anchors, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        losses = self.head.loss(cls, bbox, dirp, self.anchors,
                                targets, packed=packed)
        total = sum(losses.values())
        return total, losses

    def predict(self, variables, batch):
        cls, bbox, dirp = self.apply_eval(variables, batch)[:3]
        return jax.vmap(self.head.get_bboxes, in_axes=(0, 0, 0, None))(
            cls, bbox, dirp, self.anchors)


def synthetic_batch(batch_size: int = 2, num_points: int = 8192,
                    num_gt: int = 16, seed: int = 0,
                    pc_range=(0., -39.68, -3., 69.12, 39.68, 1.),
                    num_feats: int = 4):
    """KITTI-like random batch for benchmarks / smoke tests.

    num_feats: total point channels (>= 4); channels past xyz are random
    (e.g. 5 for Waymo's intensity+elongation).
    """
    rng = np.random.RandomState(seed)
    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:])
    pts = rng.uniform(lo, hi, (batch_size, num_points, 3)).astype(np.float32)
    inten = rng.rand(batch_size, num_points,
                     max(1, num_feats - 3)).astype(np.float32)
    points = np.concatenate([pts, inten], -1)
    mask = np.ones((batch_size, num_points), bool)

    ctr = rng.uniform(lo + 2, hi - 2, (batch_size, num_gt, 3))
    dims = rng.uniform([1.6, 0.6, 1.4], [4.5, 1.9, 1.8],
                       (batch_size, num_gt, 3))
    yaw = rng.uniform(-np.pi, np.pi, (batch_size, num_gt, 1))
    gt = np.concatenate([ctr, dims, yaw], -1).astype(np.float32)
    labels = rng.randint(0, 3, (batch_size, num_gt)).astype(np.int32)
    valid = np.ones((batch_size, num_gt), bool)
    return dict(points=jnp.asarray(points), points_mask=jnp.asarray(mask),
                gt_bboxes=jnp.asarray(gt), gt_labels=jnp.asarray(labels),
                gt_valid=jnp.asarray(valid))


class ShardedPointPillarsDetector:
    """PointPillars with the point axis sharded across chips (the
    BASELINE.json north-star scale axis; no reference analogue — the
    reference only divides the batch, SURVEY.md §2.11).

    Uses the GSPMD dense-canvas trunk
    (:class:`~mmdet3d_gaussian_tpu.parallel.sharded_model.ShardedPointPillarsNet`):
    per-point MLP runs on local point slices, the pillar merge is one ICI
    all-reduce placed by XLA.  Train under a 2D ``Mesh(('data', 'points'))``
    with the batch sharded P('data') — the model constrains its own point
    axis.  ``point_axis=None`` gives the identical unsharded program for
    parity checks.
    """

    def __init__(self, model_cfg: Optional[Dict[str, Any]] = None,
                 head_cfg: Optional[Dict[str, Any]] = None,
                 point_axis: Optional[str] = 'points',
                 merge: str = 'dense', mesh=None,
                 bucket_capacity: Optional[int] = None):
        from ..parallel.sharded_model import ShardedPointPillarsNet
        mc = dict(KITTI_3CLASS_MODEL)
        mc.update(model_cfg or {})
        hc = dict(KITTI_3CLASS_HEAD)
        hc.update(head_cfg or {})
        for k in ('max_points_per_voxel', 'max_voxels_per_sample',
                  'voxelize_mode', 'head_type'):
            mc.pop(k, None)
        self.trunk = ShardedPointPillarsNet(point_axis=point_axis,
                                            merge=merge, mesh=mesh,
                                            bucket_capacity=bucket_capacity,
                                            **mc)
        self.head = GDAnchor3DHead(**hc)
        self.model_cfg = mc
        nx, ny = self.trunk._grid()
        stride = mc['backbone_cfg']['layer_strides'][0]
        self.featmap_size = (ny // stride, nx // stride)
        self.anchors = self.head.anchors_for(self.featmap_size)

    def init(self, rng, batch):
        return self.trunk.init(rng, batch['points'], batch['points_mask'],
                               train=False)

    def apply_train(self, variables, batch):
        (cls, bbox, dirp, packed), aux = self.trunk.apply(
            variables, batch['points'], batch['points_mask'], train=True,
            mutable=['batch_stats'])
        return (cls, bbox, dirp, packed), aux['batch_stats']

    def apply_eval(self, variables, batch):
        return self.trunk.apply(variables, batch['points'],
                                batch['points_mask'], train=False)

    def loss(self, outputs, batch):
        cls, bbox, dirp, packed = outputs
        targets = jax.vmap(self.head.get_targets, in_axes=(None, 0, 0, 0))(
            self.anchors, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        losses = self.head.loss(cls, bbox, dirp, self.anchors,
                                targets, packed=packed)
        total = sum(losses.values())
        return total, losses

    def predict(self, variables, batch):
        cls, bbox, dirp = self.apply_eval(variables, batch)[:3]
        return jax.vmap(self.head.get_bboxes, in_axes=(0, 0, 0, None))(
            cls, bbox, dirp, self.anchors)


# ---------------------------------------------------------------------------
# CenterPoint family (reference configs/_base_/models/
# centerpoint_02pillar_second_secfpn_nus.py + the GD yaw-mode variant)
# ---------------------------------------------------------------------------
NUS_CENTERPOINT_MODEL = dict(
    voxel_size=(0.2, 0.2, 8.0),
    point_cloud_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
    max_points_per_voxel=20,
    max_voxels_per_sample=30000,
    voxelize_mode='dynamic',
    head_type='center',
    encoder_cfg=dict(in_channels=5, feat_channels=(64,)),
    backbone_cfg=dict(in_channels=64, out_channels=(64, 128, 256),
                      layer_nums=(3, 5, 5), layer_strides=(2, 2, 2)),
    neck_cfg=dict(in_channels=(64, 128, 256), out_channels=(128, 128, 128),
                  upsample_strides=(0.5, 1, 2)),
)

NUS_CENTERPOINT_HEAD = dict(
    tasks=[
        dict(num_classes=1), dict(num_classes=2), dict(num_classes=2),
        dict(num_classes=1), dict(num_classes=2), dict(num_classes=2),
    ],
    out_size_factor=4,
    with_vel=True,
    code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
    loss_cls=dict(type='GaussianFocalLoss', loss_weight=1.0),
    loss_bbox=dict(type='L1Loss', loss_weight=0.25),
    max_objs=100,
    gaussian_overlap=0.1, min_radius=2.0,
    test_cfg=dict(post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2,
                                           10.0],
                  max_per_img=128, score_threshold=0.1, nms_type='rotate',
                  nms_thr=0.2, post_max_size=83),
)


class CenterPointDetector:
    """CenterPoint (pillar) assembly: dynamic pillars -> SECOND/FPN ->
    multi-task CenterHead.  ``yaw_mode=True`` + ``loss_gd`` gives the
    CenterGDHead variant (reference ``gd_centerpoint_head.py:364-443``)."""

    def __init__(self, model_cfg: Optional[Dict[str, Any]] = None,
                 head_cfg: Optional[Dict[str, Any]] = None,
                 axis_name: Optional[str] = None):
        from ..models.dense_heads.centerpoint_head import CenterHead
        mc = dict(NUS_CENTERPOINT_MODEL)
        mc.update(model_cfg or {})
        hc = dict(NUS_CENTERPOINT_HEAD)
        hc.update(head_cfg or {})
        hc.setdefault('pc_range', mc['point_cloud_range'])
        hc.setdefault('voxel_size', mc['voxel_size'])
        self.head = CenterHead(**hc)
        mc.setdefault('head_cfg', dict(
            tasks=[dict(num_classes=t['num_classes'])
                   for t in self.head.tasks],
            in_channels=sum(mc['neck_cfg']['out_channels']),
            common_heads=self.head.common_heads,
        ))
        self.trunk = PointPillarsNet(axis_name=axis_name, **mc)
        self.model_cfg = mc
        nx, ny = self.trunk._grid()
        f = self.head.out_size_factor
        self.featmap_size = (ny // f, nx // f)

    def init(self, rng, batch):
        return self.trunk.init(rng, batch['points'], batch['points_mask'],
                               train=False)

    def apply_train(self, variables, batch):
        preds, aux = self.trunk.apply(
            variables, batch['points'], batch['points_mask'], train=True,
            mutable=['batch_stats'])
        return preds, aux['batch_stats']

    def apply_eval(self, variables, batch):
        return self.trunk.apply(variables, batch['points'],
                                batch['points_mask'], train=False)

    def loss(self, preds, batch):
        targets = jax.vmap(self.head.get_targets_single,
                           in_axes=(0, 0, 0, None))(
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
            self.featmap_size)
        losses = self.head.loss(preds, targets)
        total = sum(losses.values())
        return total, losses

    def predict(self, variables, batch):
        preds = self.apply_eval(variables, batch)
        def single(i_preds):
            return self.head.get_bboxes_single(i_preds)
        return jax.vmap(single)(preds)
