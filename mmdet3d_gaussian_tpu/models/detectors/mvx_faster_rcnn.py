"""Multi-modal (image + LiDAR) detector — the ``MVXFasterRCNNRev`` slot.

The reference (``models/detectors/detectors_rev.py:7-31``) ships the
upstream MVXFasterRCNN behind a kwargs-stripping wrapper: a ResNet+FPN
image branch paints per-point image features onto the cloud (PointFusion)
before the voxel encoder, then the usual pillar pipeline runs.  This is the
TPU-native equivalent built from this repo's own blocks: ImgBackbone →
ImgFPNNeck → PointFusion (static-shape point painting) →
DynamicPillarFeatureNet → SECOND/SECONDFPN → anchor head maps.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...registry import MODELS
from ...ops.scatter import batch_coords, build_scatter, compute_voxel_coords
from ...ops.voxelize import CANVAS_KEY_ORDER, bev_scatter
from ..backbones import SECOND, SECONDFPN
from ..dense_heads.anchor3d_head import Anchor3DHeadConvs
from ..img_fusion import ImgBackbone, ImgFPNNeck, PointFusion
from ..voxel_encoders import DynamicPillarFeatureNet


@MODELS.register_module()
class MVXPillarsNet(nn.Module):
    """Image-fused pillar trunk: paint, voxelize, detect."""
    voxel_size: Sequence[float] = (0.16, 0.16, 4.0)
    point_cloud_range: Sequence[float] = (0., -39.68, -3., 69.12, 39.68, 1.)
    max_voxels_per_sample: int = 16000
    img_backbone_cfg: Dict[str, Any] = None
    img_neck_cfg: Dict[str, Any] = None
    fusion_cfg: Dict[str, Any] = None
    encoder_cfg: Dict[str, Any] = None
    backbone_cfg: Dict[str, Any] = None
    neck_cfg: Dict[str, Any] = None
    head_cfg: Dict[str, Any] = None
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    def _grid(self) -> Tuple[int, int]:
        pcr, vs = self.point_cloud_range, self.voxel_size
        nx = int(round((pcr[3] - pcr[0]) / vs[0]))
        ny = int(round((pcr[4] - pcr[1]) / vs[1]))
        return nx, ny

    @nn.compact
    def __call__(self, points, points_mask, img, lidar2img,
                 train: bool = False):
        """points (B, N, C); points_mask (B, N); img (B, H, W, 3) float
        normalized; lidar2img (B, 4, 4) projecting LiDAR xyz1 to pixel
        homogeneous coords of the ORIGINAL (H, W) image.

        Returns (cls_score, bbox_pred, dir_pred) NHWC maps.
        """
        b, n, cdim = points.shape
        nx, ny = self._grid()
        dt = jnp.bfloat16 if self.compute_dtype == 'bfloat16' else None

        # --- image branch ---
        img_backbone = ImgBackbone(axis_name=self.axis_name, dtype=dt,
                                   name='img_backbone',
                                   **(self.img_backbone_cfg or {}))
        img_neck = ImgFPNNeck(axis_name=self.axis_name, dtype=dt,
                              name='img_neck', **(self.img_neck_cfg or {}))
        img_feats = img_neck(img_backbone(img, train=train), train=train)
        img_feats = [f.astype(jnp.float32) for f in img_feats]

        # --- point painting ---
        fusion = PointFusion(axis_name=self.axis_name, name='fusion',
                             **(self.fusion_cfg or {}))
        img_hw = (img.shape[1], img.shape[2])
        pt_img_feats = fusion(img_feats, points[..., :3], lidar2img, img_hw,
                              train=train)               # (B, N, C_img)
        painted = jnp.concatenate([points, pt_img_feats], axis=-1)

        # --- pillar pipeline (dynamic voxelize; reference default) ---
        flat = painted.reshape(b * n, painted.shape[-1])
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
        coords3, _ = compute_voxel_coords(
            flat[:, :3], self.point_cloud_range, self.voxel_size)
        coords3 = jnp.where(points_mask.reshape(-1, 1), coords3, -1)
        coords4 = batch_coords(coords3, batch_idx)
        nz = max(1, int(round((self.point_cloud_range[5]
                               - self.point_cloud_range[2])
                              / self.voxel_size[2])))
        scatter = build_scatter(coords4, (b, nx, ny, nz),
                                self.max_voxels_per_sample * b,
                                key_order=CANVAS_KEY_ORDER)

        enc_cfg = dict(self.encoder_cfg or {})
        enc_cfg.setdefault('voxel_size', self.voxel_size)
        enc_cfg.setdefault('point_cloud_range', self.point_cloud_range)
        encoder = DynamicPillarFeatureNet(axis_name=self.axis_name,
                                          name='voxel_encoder', **enc_cfg)
        # voxel-sorted point order: sorted segment ops in the encoder and a
        # sorted BEV splat (see ops/scatter.py::Scatter.sorted_view)
        flat_sorted = jnp.take(flat, scatter.sort_order, axis=0)
        pillar_feats = encoder(flat_sorted, scatter.sorted_view(),
                               train=train)

        canvas = bev_scatter(pillar_feats, scatter.voxel_coords, b, nx, ny,
                             indices_sorted=True)
        if dt is not None:
            canvas = canvas.astype(dt)
        backbone = SECOND(axis_name=self.axis_name, dtype=dt,
                          name='backbone', **(self.backbone_cfg or {}))
        neck = SECONDFPN(axis_name=self.axis_name, dtype=dt, name='neck',
                         **(self.neck_cfg or {}))
        feats = neck(backbone(canvas, train=train), train=train)
        head = Anchor3DHeadConvs(name='bbox_head', **(self.head_cfg or {}))
        return head(feats)
