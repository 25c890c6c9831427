"""PV-RCNN two-stage detector engine.

Assembly mirror of the reference ``PVRCNN`` detector
(``/root/reference/mmdet3d_gaussian/models/detectors/pv_rcnn.py:12-150``):
hard voxelize -> HardSimpleVFE (per-voxel mean) -> MlvlSparseEncoder ->
SECOND/FPN -> RPN (anchor head) -> proposals -> VoxelSetAbstraction
keypoints -> PointwiseMaskHead + RoI-grid pooling -> PVRCNNBboxHead.

TPU structure: two flax modules (first stage / second stage) so the
proposal generation — pure math with static-shape NMS — sits between them
without entangling flax state.  The whole train step (both stages + both
losses) jits as one graph.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbones import SECOND, SECONDFPN
from ..models.dense_heads.anchor3d_head import (Anchor3DHeadConvs,
                                                GDAnchor3DHead)
from ..models.middle_encoders import MlvlSparseEncoder, VoxelSetAbstraction
from ..models.roi_heads import (Batch3DRoIGridExtractor, PVRCNNBboxHead,
                                PointwiseMaskHead, RoISamples,
                                assign_and_sample, corner_loss_lidar,
                                decode_roi_boxes, roi_canonical_targets)
from ..core.bbox.coders import DeltaXYZWLHRBBoxCoder
from ..ops.scatter import batch_coords, build_scatter, compute_voxel_coords
from ..registry import LOSSES


KITTI_PVRCNN = dict(
    voxel_size=(0.05, 0.05, 0.1),
    point_cloud_range=(0., -40., -3., 70.4, 40., 1.),
    max_voxels=16000,
    sparse_shape=(41, 1600, 1408),        # (Z, Y, X)
    base_channels=16,
    encoder_channels=((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64)),
    encoder_out_channels=128,
    backbone=dict(in_channels=256, out_channels=(128, 256),
                  layer_nums=(5, 5), layer_strides=(1, 2)),
    neck=dict(in_channels=(128, 256), out_channels=(256, 256),
              upsample_strides=(1, 2)),
    num_keypoints=2048,
    vsa_out_channels=128,
    voxel_sa_configs=[
        dict(scale_factor=1, in_channels=16, pool_radius=(0.4, 0.8),
             samples=(16, 16), mlps=((16, 16), (16, 16))),
        dict(scale_factor=2, in_channels=32, pool_radius=(0.8, 1.2),
             samples=(16, 32), mlps=((32, 32), (32, 32))),
        dict(scale_factor=4, in_channels=64, pool_radius=(1.2, 2.4),
             samples=(16, 32), mlps=((64, 64), (64, 64))),
        dict(scale_factor=8, in_channels=64, pool_radius=(2.4, 4.8),
             samples=(16, 32), mlps=((64, 64), (64, 64))),
    ],
    rawpoint_sa_config=dict(in_channels=1, pool_radius=(0.4, 0.8),
                            samples=(16, 16), mlps=((16, 16), (16, 16))),
    bev_sa=True,
    num_proposals=128,
    grid_size=6,
    roi_pool_radius=(0.8, 1.6),
    roi_samples_per_radius=(16, 16),
    roi_mlps=((64, 64), (64, 64)),
)

KITTI_PVRCNN_RPN_HEAD = dict(
    num_classes=3,
    anchor_generator=dict(
        ranges=[[0.2, -39.8, -0.6, 70.2, 39.8, -0.6],
                [0.2, -39.8, -0.6, 70.2, 39.8, -0.6],
                [0.2, -39.8, -1.78, 70.2, 39.8, -1.78]],
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
    loss_dir=dict(type='CrossEntropyLoss', use_sigmoid=False,
                  loss_weight=0.2),
    test_cfg=dict(use_rotate_nms=True, nms_thr=0.8, score_thr=0.0,
                  nms_pre=512, max_num=128),
)


class PVRCNNFirstStage(nn.Module):
    cfg: Any = None

    @nn.compact
    def __call__(self, voxel_feats, voxel_coords, batch_size: int,
                 train: bool = False):
        c = self.cfg
        enc = MlvlSparseEncoder(
            in_channels=voxel_feats.shape[-1],
            sparse_shape=c['sparse_shape'],
            base_channels=c['base_channels'],
            encoder_channels=c['encoder_channels'],
            out_channels=c['encoder_out_channels'],
            capacity=c['max_voxels'] * batch_size,   # per-sample capacity
            name='middle_encoder')
        levels, bev = enc(voxel_feats, voxel_coords, batch_size, train)
        feats = SECONDFPN(name='neck', **c['neck'])(
            SECOND(name='backbone', **c['backbone'])(bev, train), train)
        rpn = Anchor3DHeadConvs(num_classes=c['rpn_num_classes'],
                                num_anchors=c['rpn_num_anchors'],
                                feat_channels=feats.shape[-1],
                                name='rpn_head')
        return levels, bev, feats, rpn(feats)


class PVRCNNSecondStage(nn.Module):
    cfg: Any = None

    @nn.compact
    def __call__(self, levels, bev, points, points_mask, proposals,
                 proposals_valid, train: bool = False):
        c = self.cfg
        vsa = VoxelSetAbstraction(
            num_keypoints=c['num_keypoints'],
            out_channels=c['vsa_out_channels'],
            voxel_size=c['voxel_size'],
            point_cloud_range=c['point_cloud_range'],
            voxel_sa_configs=c['voxel_sa_configs'],
            rawpoint_sa_config=c['rawpoint_sa_config'],
            bev_sa_config=(dict(scale_factor=8, in_channels=bev.shape[-1])
                           if c['bev_sa'] else None),
            name='keypoints_encoder')
        vsa_out = vsa(levels[:len(c['voxel_sa_configs'])], points,
                      points_mask, bev, train)

        mask_head = PointwiseMaskHead(
            in_channels=vsa_out['keypoint_features'].shape[-1],
            name='semantic_head')
        seg_logits = mask_head(vsa_out['keypoint_features'], train)

        seg_score = jax.nn.sigmoid(seg_logits[..., 0:1])
        weighted = vsa_out['fusion_keypoint_features'] * seg_score

        extractor = Batch3DRoIGridExtractor(
            in_channels=c['vsa_out_channels'],
            pool_radius=c['roi_pool_radius'],
            samples=c['roi_samples_per_radius'],
            mlps=c['roi_mlps'], grid_size=c['grid_size'],
            name='roi_extractor')
        grid_feats = extractor(weighted, vsa_out['keypoints'], proposals,
                               proposals_valid, train)
        bbox_head = PVRCNNBboxHead(grid_size=c['grid_size'],
                                   name='bbox_head')
        cls, reg = bbox_head(grid_feats, proposals_valid, train)
        return dict(keypoints=vsa_out['keypoints'], seg_logits=seg_logits,
                    roi_cls=cls, roi_reg=reg)


class PVRCNNDetector:
    """Engine: config holder + pure jittable functions."""

    def __init__(self, model_cfg: Optional[Dict[str, Any]] = None,
                 rpn_head_cfg: Optional[Dict[str, Any]] = None):
        c = dict(KITTI_PVRCNN)
        c.update(model_cfg or {})
        hc = dict(KITTI_PVRCNN_RPN_HEAD)
        hc.update(rpn_head_cfg or {})
        self.cfg = c
        self.rpn_head = GDAnchor3DHead(**hc)
        # derive RPN conv channels from the SAME head config (no literals)
        c['rpn_num_classes'] = self.rpn_head.num_classes
        c['rpn_num_anchors'] = self.rpn_head.anchor_generator.num_base_anchors
        self.first = PVRCNNFirstStage(cfg=c)
        self.second = PVRCNNSecondStage(cfg=c)
        self.roi_coder = DeltaXYZWLHRBBoxCoder()
        self.loss_seg = LOSSES.build(dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0))
        self.loss_roi_bbox = LOSSES.build(dict(
            type='SmoothL1Loss', beta=1.0 / 9.0, reduction='none',
            loss_weight=1.0))
        # rpn anchors at the neck output resolution
        nz, ny, nx = c['sparse_shape']
        self.bev_shape = (ny // 8, nx // 8)
        self.featmap_size = self.bev_shape  # backbone stride 1 + neck up
        self.anchors = self.rpn_head.anchors_for(self.featmap_size)

    # ------------------------------------------------------------------
    def voxelize(self, batch):
        """Hard voxelization + HardSimpleVFE (per-voxel mean) -> feats,
        coords (b, z, y, x)."""
        c = self.cfg
        b, n, cdim = batch['points'].shape
        flat = batch['points'].reshape(b * n, cdim)
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
        coords3, _ = compute_voxel_coords(flat[:, :3],
                                          c['point_cloud_range'],
                                          c['voxel_size'])
        coords3 = jnp.where(batch['points_mask'].reshape(-1, 1), coords3, -1)
        coords4 = batch_coords(coords3, bidx)   # (b, ix, iy, iz)
        nzs = (b, c['sparse_shape'][2], c['sparse_shape'][1],
               c['sparse_shape'][0])
        # capacity is PER SAMPLE like the reference max_voxels (16000/scan)
        sc = build_scatter(coords4, nzs, c['max_voxels'] * b)
        # HardSimpleVFE mean over the voxel-sorted order (sorted segment
        # lowering; see Scatter.sorted_view)
        feats = sc.sorted_view().reduce(
            jnp.take(flat, sc.sort_order, axis=0), 'mean')
        # reorder coords to (b, z, y, x)
        vc = sc.voxel_coords
        coords_bzyx = jnp.stack([vc[:, 0], vc[:, 3], vc[:, 2], vc[:, 1]],
                                -1)
        coords_bzyx = jnp.where(vc[:, :1] >= 0, coords_bzyx, -1)
        return feats, coords_bzyx

    def init(self, rng, batch):
        b = batch['points'].shape[0]
        feats, coords = self.voxelize(batch)
        r1, r2 = jax.random.split(rng)
        v1 = self.first.init(r1, feats, coords, b)
        levels, bev, _, _ = self.first.apply(v1, feats, coords, b)
        proposals = jnp.zeros((b, self.cfg['num_proposals'], 7))
        proposals = proposals.at[..., 3:6].set(1.0)
        pv = jnp.ones((b, self.cfg['num_proposals']), bool)
        v2 = self.second.init(r2, levels, bev, batch['points'],
                              batch['points_mask'], proposals, pv)
        return {'first': v1, 'second': v2}

    def _proposals(self, rpn_outs):
        """RPN maps -> per-sample fixed-size proposals (boxes, labels,
        scores, valid).

        Uses the PartA2RPNHead class-agnostic NMS flow
        (:meth:`GDAnchor3DHead.get_proposals`) — the reference PV-RCNN's
        first stage (``hv_pvrcnn_secfpn_4x4_80e_kitti-3d-3class.py:105``)
        suppresses overlapping proposals across classes with a single NMS.
        """
        cls, bbox, dirp = rpn_outs[:3]
        num = self.cfg['num_proposals']

        def single(c, b, d):
            boxes, scores, labels, valid = self.rpn_head.get_proposals(
                c, b, d, self.anchors, max_num=num)
            return boxes, labels, scores, valid

        return jax.vmap(single)(cls, bbox, dirp)

    def apply_train(self, variables, batch, rngs=None):
        b = batch['points'].shape[0]
        feats, coords = self.voxelize(batch)
        (levels, bev, neck, rpn_outs), aux1 = self.first.apply(
            variables['first'], feats, coords, b, train=True,
            mutable=['batch_stats'])
        boxes, labels, scores, valid = self._proposals(
            jax.tree_util.tree_map(jax.lax.stop_gradient, rpn_outs))
        # assign + sample FIRST so the second stage runs on exactly the
        # sampled rois — roi_cls/roi_reg then align 1:1 with the targets
        # (running on raw proposals and permuting targets afterwards would
        # pair prediction i with the target of a different roi)
        samples = jax.vmap(
            lambda p, l, v, gb, gl, gv: assign_and_sample(
                p, l, v, gb, gl, gv,
                num_samples=self.cfg['num_proposals']))(
            boxes, labels, valid, batch['gt_bboxes'],
            batch['gt_labels'], batch['gt_valid'])
        out2, aux2 = self.second.apply(
            variables['second'], levels, bev, batch['points'],
            batch['points_mask'], samples.rois, samples.valid, train=True,
            mutable=['batch_stats'],
            rngs=rngs)
        # capacity telemetry: cumulative sparse-conv sites dropped because
        # an out_capacity was too small (0 = capacities sized correctly)
        out2 = dict(out2, sparse_overflow=levels[-1].overflow)
        return (rpn_outs, out2, samples), \
            {'first': aux1['batch_stats'], 'second': aux2['batch_stats']}

    # ------------------------------------------------------------------
    def rcnn_losses(self, samples, roi_cls, roi_reg):
        """Second-stage losses for already-drawn RoI samples (reference
        ``pvrcnn_bbox_head.py:140-212`` loss + ``:213-253`` get_targets
        assembly, batch-concatenated weight normalization included).

        samples: RoISamples (B, R, ...); roi_cls (B, R, 1); roi_reg (B, R, 7).
        """
        losses = {}
        label, label_w, bbox_tgt, reg_w = jax.vmap(
            lambda s: roi_canonical_targets(s, self.roi_coder))(samples)

        roi_cls = roi_cls[..., 0]
        label_w = label_w / jnp.clip(jnp.sum(label_w), 1.0)
        # BCE against the soft iou-interval label (reference uses
        # binary_cross_entropy on the 2*iou-0.5 soft targets)
        p = roi_cls.reshape(-1)
        soft = label.reshape(-1)
        bce = (jnp.maximum(p, 0) - p * soft + jnp.log1p(jnp.exp(-jnp.abs(p))))
        losses['loss_roi_cls'] = jnp.sum(bce * label_w.reshape(-1))

        reg_w_n = reg_w / jnp.clip(jnp.sum(reg_w), 1.0)
        sml1 = self.loss_roi_bbox(roi_reg, bbox_tgt)
        losses['loss_roi_bbox'] = jnp.sum(
            jnp.sum(sml1, -1) * reg_w_n)

        # corner loss on decoded positives
        dec = decode_roi_boxes(samples.rois, roi_reg, self.roi_coder)
        corner = corner_loss_lidar(dec.reshape(-1, 7),
                                   samples.gt_of_roi.reshape(-1, 7))
        losses['loss_corner'] = jnp.sum(corner * reg_w_n.reshape(-1))
        return losses

    def loss(self, outputs, batch):
        rpn_outs, out2, samples = outputs
        losses = {}

        # RPN losses (anchor head)
        cls, bbox, dirp, rpn_packed = rpn_outs
        targets = jax.vmap(self.rpn_head.get_targets,
                           in_axes=(None, 0, 0, 0))(
            self.anchors, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        rpn_losses = self.rpn_head.loss(cls, bbox, dirp, self.anchors,
                                        targets, packed=rpn_packed)
        losses.update({f'rpn.{k}': v for k, v in rpn_losses.items()})

        # semantic segmentation loss on keypoints
        mask_head = PointwiseMaskHead(in_channels=1)   # math only
        seg_tgt = mask_head.get_targets(
            out2['keypoints'], batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        losses['loss_semantic'] = mask_head.loss(out2['seg_logits'],
                                                 seg_tgt, self.loss_seg)

        # RoI losses — samples were drawn before the second stage ran, so
        # out2['roi_cls'][b, i] is the prediction FOR samples.rois[b, i]
        losses.update(self.rcnn_losses(samples, out2['roi_cls'],
                                       out2['roi_reg']))

        total = sum(losses.values())
        # telemetry (reported, never part of the objective)
        if 'sparse_overflow' in out2:
            losses['metric.sparse_overflow'] = (
                out2['sparse_overflow'].astype(jnp.float32))
        return total, losses

    # -- inference ------------------------------------------------------
    def apply_eval(self, variables, batch):
        b = batch['points'].shape[0]
        feats, coords = self.voxelize(batch)
        levels, bev, neck, rpn_outs = self.first.apply(
            variables['first'], feats, coords, b)
        boxes, labels, scores, valid = self._proposals(rpn_outs)
        out2 = self.second.apply(variables['second'], levels, bev,
                                 batch['points'], batch['points_mask'],
                                 boxes, valid)
        return out2, (boxes, labels, scores, valid)

    def predict(self, variables, batch, score_thr: float = 0.1,
                nms_thr: float = 0.1, max_num: int = 64):
        """Two-stage inference (reference ``PVRCNNROIHead.simple_test`` ->
        ``bbox_head.get_bboxes``, ``pvrcnn_bbox_head.py:353-477``):
        RoI-refined boxes + sigmoid IoU-quality score, per-sample rotated
        NMS -> fixed-size detections."""
        from ..ops.nms import nms_bev

        out2, (rois, roi_labels, roi_scores, roi_valid) = self.apply_eval(
            variables, batch)
        refined = decode_roi_boxes(rois, out2['roi_reg'], self.roi_coder)
        quality = jax.nn.sigmoid(out2['roi_cls'][..., 0])
        score = quality * jnp.where(roi_valid, 1.0, 0.0)

        def single(boxes, s, labels, valid):
            order = jnp.argsort(-jnp.where(valid, s, -jnp.inf))
            boxes, s, labels, valid = (boxes[order], s[order],
                                       labels[order], valid[order])
            bev_boxes = jnp.stack([boxes[:, 0], boxes[:, 1], boxes[:, 3],
                                   boxes[:, 4], boxes[:, 6]], -1)
            keep = nms_bev(bev_boxes, s, nms_thr,
                           valid=valid & (s > score_thr))
            s = jnp.where(keep, s, -1.0)
            top_s, idx = jax.lax.top_k(s, min(max_num, s.shape[0]))
            return boxes[idx], top_s, labels[idx], top_s > score_thr

        return jax.vmap(single)(refined, score, roi_labels, roi_valid)
