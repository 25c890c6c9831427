"""Multi-modal (image + LiDAR) detector engine — MVXFasterRCNN slot.

Reference parity: ``models/detectors/detectors_rev.py:7-31`` exposes the
upstream MVXFasterRCNN (ResNet+FPN image branch, PointFusion painting,
pillar pipeline, Anchor3DHead).  Here the same assembly is built from this
repo's TPU-native blocks; the engine mirrors :class:`PointPillarsDetector`
with two extra batch keys:

    img      (B, H, W, 3) float32, normalized
    lidar2img (B, 4, 4)  float32 LiDAR -> pixel homogeneous projection
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dense_heads.anchor3d_head import GDAnchor3DHead
from ..models.detectors.mvx_faster_rcnn import MVXPillarsNet
from .detector import KITTI_3CLASS_HEAD, synthetic_batch


KITTI_MVX_MODEL = dict(
    voxel_size=(0.16, 0.16, 4.0),
    point_cloud_range=(0., -39.68, -3., 69.12, 39.68, 1.),
    max_voxels_per_sample=16000,
    img_backbone_cfg=dict(stage_channels=(32, 64, 128, 256),
                          blocks_per_stage=2),
    img_neck_cfg=dict(out_channels=64),
    fusion_cfg=dict(out_channels=64, img_levels=(4, 8, 16, 32)),
    # painted channels: 4 raw + 64 image
    encoder_cfg=dict(in_channels=68, feat_channels=(64,)),
    backbone_cfg=dict(in_channels=64, out_channels=(64, 128, 256),
                      layer_nums=(3, 5, 5), layer_strides=(2, 2, 2)),
    neck_cfg=dict(in_channels=(64, 128, 256), out_channels=(128, 128, 128),
                  upsample_strides=(1, 2, 4)),
    head_cfg=dict(num_classes=3, num_anchors=6, feat_channels=384),
)


class MVXDetector:
    """Image-fused PointPillars with the GD anchor head."""

    def __init__(self, model_cfg: Optional[Dict[str, Any]] = None,
                 head_cfg: Optional[Dict[str, Any]] = None,
                 axis_name: Optional[str] = None):
        mc = dict(KITTI_MVX_MODEL)
        mc.update(model_cfg or {})
        hc = dict(KITTI_3CLASS_HEAD)
        hc.update(head_cfg or {})
        self.trunk = MVXPillarsNet(axis_name=axis_name, **mc)
        self.head = GDAnchor3DHead(**hc)
        self.model_cfg = mc
        nx, ny = self.trunk._grid()
        stride = mc['backbone_cfg']['layer_strides'][0]
        self.featmap_size = (ny // stride, nx // stride)
        self.anchors = self.head.anchors_for(self.featmap_size)

    def init(self, rng, batch):
        return self.trunk.init(rng, batch['points'], batch['points_mask'],
                               batch['img'], batch['lidar2img'],
                               train=False)

    def apply_train(self, variables, batch):
        (cls, bbox, dirp, packed), aux = self.trunk.apply(
            variables, batch['points'], batch['points_mask'], batch['img'],
            batch['lidar2img'], train=True, mutable=['batch_stats'])
        return (cls, bbox, dirp, packed), aux['batch_stats']

    def apply_eval(self, variables, batch):
        return self.trunk.apply(variables, batch['points'],
                                batch['points_mask'], batch['img'],
                                batch['lidar2img'], train=False)

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


def synthetic_mvx_batch(batch_size: int = 2, num_points: int = 8192,
                        num_gt: int = 16, img_hw=(192, 640), seed: int = 0,
                        pc_range=(0., -39.68, -3., 69.12, 39.68, 1.)):
    """KITTI-like batch with an image + a plausible front-camera matrix."""
    batch = synthetic_batch(batch_size, num_points, num_gt, seed, pc_range)
    rng = np.random.RandomState(seed + 1)
    h, w = img_hw
    img = rng.rand(batch_size, h, w, 3).astype(np.float32)
    # simple pinhole looking down +x: u = fx * (-y/x) + cx, v = fy * (-z/x)
    # + cy -> lidar2img = K @ R with camera axes (right=-y, down=-z, fwd=x)
    fx = fy = 0.6 * w
    cx, cy = w / 2, h / 2
    cam = np.array([[0., -1., 0., 0.],
                    [0., 0., -1., 0.],
                    [1., 0., 0., 0.],
                    [0., 0., 0., 1.]], np.float32)
    K = np.array([[fx, 0., cx, 0.],
                  [0., fy, cy, 0.],
                  [0., 0., 1., 0.],
                  [0., 0., 0., 1.]], np.float32)
    l2i = (K @ cam)[None].repeat(batch_size, 0)
    batch['img'] = jnp.asarray(img)
    batch['lidar2img'] = jnp.asarray(l2i)
    return batch
