"""Image branch + LiDAR-camera point fusion for multi-modal detection.

TPU-native counterpart of the reference's multi-modal ``MVXFasterRCNNRev``
(reference ``models/detectors/detectors_rev.py:7-31``, which force-overrides
the upstream MVXFasterRCNN: ResNet+FPN image branch and a PointFusion layer
that paints per-point image features onto the LiDAR cloud before the voxel
encoder).  Everything here is static-shape and NHWC so XLA tiles the convs
onto the MXU; projection + bilinear sampling are pure gather/FMA ops on the
point axis.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import MODELS


class BasicResBlock(nn.Module):
    """3x3 + 3x3 residual block (NHWC, BN, optional stride-2 downsample)."""
    channels: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, axis_name=self.axis_name,
                         name='bn1')(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='conv2')(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, axis_name=self.axis_name,
                         name='bn2')(h)
        if self.stride != 1 or x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype, name='down')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, axis_name=self.axis_name,
                             name='bn_down')(x)
        return nn.relu(h + x)


@MODELS.register_module()
class ImgBackbone(nn.Module):
    """ResNet-style multi-scale image backbone (NHWC).

    Stem downsamples 4x, then ``len(stage_channels)`` stages each halving
    resolution; returns one feature map per stage (strides 4, 8, 16, ...).
    """
    stage_channels: Sequence[int] = (32, 64, 128, 256)
    blocks_per_stage: int = 2
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, img, train: bool = False):
        x = nn.Conv(self.stage_channels[0], (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name='stem')(img)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, axis_name=self.axis_name,
                         name='stem_bn')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for i, ch in enumerate(self.stage_channels):
            for j in range(self.blocks_per_stage):
                stride = 2 if (i > 0 and j == 0) else 1
                x = BasicResBlock(ch, stride=stride, axis_name=self.axis_name,
                                  dtype=self.dtype,
                                  name=f'stage{i}_block{j}')(x, train)
            outs.append(x)
        return outs


@MODELS.register_module()
class ImgFPNNeck(nn.Module):
    """Top-down FPN over backbone stages; every level gets ``out_channels``."""
    out_channels: int = 64
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f'lateral_{i}')(f)
            for i, f in enumerate(feats)]
        for i in range(len(laterals) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            # crop in case the lower level has odd spatial size
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        return [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f'fpn_out_{i}')(l)
            for i, l in enumerate(laterals)]


def project_points_to_img(points_xyz, lidar2img, img_hw):
    """Project LiDAR points into pixel coordinates.

    points_xyz (N, 3); lidar2img (4, 4) row-major homogeneous projection;
    img_hw (h, w) of the ORIGINAL image the matrix maps into.
    Returns uv (N, 2) in pixels (x, y) and valid (N,) bool
    (in front of the camera and inside the image).
    """
    n = points_xyz.shape[0]
    hom = jnp.concatenate(
        [points_xyz, jnp.ones((n, 1), points_xyz.dtype)], axis=-1)
    cam = hom @ lidar2img.T                       # (N, 4)
    depth = cam[:, 2]
    eps = 1e-5
    uv = cam[:, :2] / jnp.maximum(depth[:, None], eps)
    h, w = img_hw
    valid = ((depth > eps) & (uv[:, 0] >= 0) & (uv[:, 0] <= w - 1)
             & (uv[:, 1] >= 0) & (uv[:, 1] <= h - 1))
    return uv, valid


def bilinear_sample_img(feat, uv):
    """Bilinear-sample (H, W, C) at pixel coords uv (N, 2) = (x, y),
    pixel centers at integer coordinates (align_corners=True semantics,
    matching the reference's ``F.grid_sample`` in the fusion layer)."""
    h, w, _ = feat.shape
    x = jnp.clip(uv[:, 0], 0, w - 1)
    y = jnp.clip(uv[:, 1], 0, h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    dx = (x - x0)[:, None]
    dy = (y - y0)[:, None]
    f00 = feat[y0, x0]
    f01 = feat[y0, x0 + 1]
    f10 = feat[y0 + 1, x0]
    f11 = feat[y0 + 1, x0 + 1]
    return ((1 - dy) * ((1 - dx) * f00 + dx * f01)
            + dy * ((1 - dx) * f10 + dx * f11))


@MODELS.register_module()
class PointFusion(nn.Module):
    """Paint per-point image features from multi-level FPN maps.

    The reference's fusion layer laterally projects each image level,
    grid-samples at the projected point location, sums across levels and
    runs a small MLP; points that miss the image get zeros.  ``img_levels``
    gives the stride of each FPN level relative to the ORIGINAL image the
    ``lidar2img`` matrix targets.
    """
    out_channels: int = 64
    img_levels: Sequence[int] = (4, 8, 16, 32)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, points_xyz, lidar2img, img_hw,
                 train: bool = False):
        """feats: list of (B, H_l, W_l, C) FPN maps; points_xyz (B, N, 3);
        lidar2img (B, 4, 4); img_hw original (h, w).
        Returns (B, N, out_channels) fused image features, zero off-image.

        The projection/sampling is a pure vmapped gather; flax submodules
        only ever see (B, N, C) tensors (Dense acts on the last axis), so
        no module call happens under ``jax.vmap``.
        """
        uv, valid = jax.vmap(
            lambda p, m: project_points_to_img(p, m, img_hw))(
                points_xyz, lidar2img)                       # (B,N,2), (B,N)
        acc = 0.
        for i, (f, stride) in enumerate(zip(feats, self.img_levels)):
            sampled = jax.vmap(bilinear_sample_img)(f, uv / stride)
            acc = acc + nn.Dense(self.out_channels,
                                 name=f'lateral_{i}')(sampled)
        out = nn.relu(acc)
        out = nn.Dense(self.out_channels, name='fuse')(out)
        out = nn.relu(out)
        return out * valid[..., None].astype(out.dtype)
