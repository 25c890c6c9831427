"""Multi-view-fusion pillar encoder (MVF), TPU-native.

Redesign of the reference ``PillarMVFFeatureNet`` + ``SingleViewNet``
(``/root/reference/mmdet3d_gaussian/models/voxel_encoders/pillar_mvf_encoder.py``)
and the PillarOD coordinate transforms
(``models/detectors/pillar_od.py:24-45``): points are voxelized in several
coordinate views (cartesian + cylindrical [+ spherical]), each view runs a
per-view tower (pointnet -> pillar scatter -> 3-level resnet with deconv
fusion -> bilinear sample back to points), the per-point view features are
fused by shared pointnets, and the final features reduce on view 0's pillars.

The per-sample ``grid_sample`` loop of the reference (:96-105) becomes a
batched bilinear gather; per-view CUDA ``Scatter`` objects become the
sort-based :func:`build_scatter`.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.scatter import Scatter, batch_coords, build_scatter, \
    compute_voxel_coords
from ..ops.voxelize import bev_scatter
from ..registry import MODELS
from .voxel_encoders import MaskedBatchNorm, PointVoxelStatsCalculator


# -- coordinate views (reference pillar_od.py:24-45) -----------------------
def to_cartesian(points):
    return points


def to_cylindrical(points):
    phi = jnp.arctan2(points[..., 1], points[..., 0])
    rho = jnp.linalg.norm(points[..., :2], axis=-1)
    z = points[..., 2]
    return jnp.concatenate(
        [jnp.stack([phi, z, rho], -1), points[..., 3:]], -1)


def to_spherical(points):
    yaw = jnp.arctan2(points[..., 1], points[..., 0])
    rho = jnp.linalg.norm(points[..., :3], axis=-1)
    pitch = jnp.arcsin(points[..., 2] / jnp.maximum(rho, 1e-6))
    return jnp.concatenate(
        [jnp.stack([yaw, pitch, rho], -1), points[..., 3:]], -1)


VIEW_TRANSFORMS = dict(cartesian=to_cartesian, cylindrical=to_cylindrical,
                       spherical=to_spherical)


class BasicBlock2D(nn.Module):
    """ResNet BasicBlock, NHWC."""
    channels: int
    stride: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, axis_name=self.axis_name,
                                name=name)
        y = nn.Conv(self.channels, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name='conv1')(x)
        y = nn.relu(bn('bn1')(y))
        y = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name='conv2')(y)
        y = bn('bn2')(y)
        if self.stride != 1 or x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        name='down_conv')(x)
            x = bn('down_bn')(x)
        return nn.relu(x + y)


def bilinear_sample_zeros(canvas, uv):
    """Bilinear sample (H, W, C) at continuous pixel coords uv (N, 2) =
    (x_pix, y_pix); zero padding outside (grid_sample align_corners=False,
    padding_mode='zeros')."""
    h, w, c = canvas.shape
    u, v = uv[:, 0], uv[:, 1]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)

    def tap(vi, ui, wgt):
        ok = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
        val = canvas[jnp.clip(vi, 0, h - 1), jnp.clip(ui, 0, w - 1)]
        return val * (wgt * ok)[:, None]

    du, dv = u - u0, v - v0
    return (tap(v0, u0, (1 - du) * (1 - dv))
            + tap(v0, u0 + 1, du * (1 - dv))
            + tap(v0 + 1, u0, (1 - du) * dv)
            + tap(v0 + 1, u0 + 1, du * dv))


class SingleViewNet(nn.Module):
    """Per-view tower (reference ``SingleViewNet``, :14-107)."""
    feat_channels: int
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    reduce_op: str = 'max'
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pts_xyz, pts_feats, scatter: Scatter,
                 batch_size: int, train: bool):
        """pts_xyz (N, 3) view coords; pts_feats (N, C); returns (N, C)."""
        fc = self.feat_channels
        y = nn.Dense(fc, use_bias=False, name='pointnet')(pts_feats)
        y = MaskedBatchNorm(axis_name=self.axis_name, name='pointnet_bn')(
            y, mask=scatter.valid_point_mask, use_running_average=not train)
        y = nn.relu(y)

        pillar = scatter.reduce(y, self.reduce_op)
        pcr, vs = self.point_cloud_range, self.voxel_size
        nx = math.ceil((pcr[3] - pcr[0]) / vs[0])
        ny = math.ceil((pcr[4] - pcr[1]) / vs[1])
        canvas = bev_scatter(pillar, scatter.voxel_coords, batch_size,
                             nx, ny, indices_sorted=True)

        out1 = BasicBlock2D(fc, axis_name=self.axis_name,
                            name='res1')(canvas, train)
        out2 = BasicBlock2D(fc, stride=2, axis_name=self.axis_name,
                            name='res2')(canvas, train)
        out3 = BasicBlock2D(fc, stride=2, axis_name=self.axis_name,
                            name='res3')(out2, train)
        # ConvTranspose(k=s, stride=s) lowered as 1x1 conv + depth-to-space
        # (exact; the input-dilated ConvTranspose lowering is the expensive
        # form on TPU, especially in backward — see SECONDFPN d2s notes)
        from .backbones import (_DeconvKernelParam, conv1x1,
                                deconv_kernel_as_1x1, depth_to_space)
        k2 = _DeconvKernelParam(out2.shape[-1], fc, 2, name='deconv2')()
        out2 = depth_to_space(
            conv1x1(out2, deconv_kernel_as_1x1(k2).astype(out2.dtype)),
            2, fc)
        k3 = _DeconvKernelParam(out3.shape[-1], fc, 4, name='deconv3')()
        out3 = depth_to_space(
            conv1x1(out3, deconv_kernel_as_1x1(k3).astype(out3.dtype)),
            4, fc)
        # crop deconv outputs to out1's spatial size (odd canvases)
        out2 = out2[:, :out1.shape[1], :out1.shape[2]]
        out3 = out3[:, :out1.shape[1], :out1.shape[2]]
        fused = jnp.concatenate([out1, out2, out3], -1)
        fused = nn.Conv(fc, (3, 3), padding=((1, 1), (1, 1)),
                        name='fuse_conv')(fused)

        # sample back to points (align_corners=False pixel mapping)
        u = (pts_xyz[:, 0] - pcr[0]) / (pcr[3] - pcr[0]) * nx - 0.5
        v = (pts_xyz[:, 1] - pcr[1]) / (pcr[4] - pcr[1]) * ny - 0.5
        uv = jnp.stack([u, v], -1)
        b_of_point = scatter.mapback(
            scatter.voxel_coords[:, 0:1].astype(jnp.float32))[:, 0]
        b_of_point = jnp.clip(b_of_point.astype(jnp.int32), 0,
                              batch_size - 1)
        # gather per-point from its sample's canvas via one-hot batch select
        out = jnp.zeros((pts_xyz.shape[0], fc), fused.dtype)
        for b in range(batch_size):
            sel = (b_of_point == b) & scatter.valid_point_mask
            sampled = bilinear_sample_zeros(fused[b], uv)
            out = out + sampled * sel[:, None]
        return out


@MODELS.register_module()
class PillarMVFFeatureNet(nn.Module):
    """Multi-view pillar encoder (reference :110-248)."""
    in_channels: int = 4
    feat_channels: int = 64
    views: Sequence[str] = ('cartesian', 'cylindrical')
    voxel_size: Sequence[Sequence[float]] = ((0.32, 0.32, 6.0),
                                             (0.006545, 0.2, 80.0))
    point_cloud_range: Sequence[Sequence[float]] = (
        (-74.88, -74.88, -2, 74.88, 74.88, 4),
        (-3.1416, -2.0, 0.0, 3.1416, 4.0, 80.0))
    with_covariance: bool = True
    reduce_op: str = 'max'
    max_voxels: int = 30000
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        """points (B, N, C) -> (pillar feats (V, fc), view-0 coords (V, 4),
        canvas dims (nx, ny))."""
        b, n, cdim = points.shape
        flat = points.reshape(b * n, cdim)
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
        pmask = points_mask.reshape(-1)

        view_pts, view_coords = [], []
        for view, vs, pcr in zip(self.views, self.voxel_size,
                                 self.point_cloud_range):
            vp = VIEW_TRANSFORMS[view](flat)
            coords3, _ = compute_voxel_coords(vp[:, :3], pcr, vs)
            coords3 = jnp.where(pmask[:, None], coords3, -1)
            view_pts.append(vp)
            view_coords.append(coords3)

        # cross-view invalid masking (reference :217-225): a point invalid
        # in ANY view is invalid in all
        invalid = ~pmask
        for c3 in view_coords:
            invalid = invalid | jnp.all(c3 < 0, -1)
        view_coords = [jnp.where(invalid[:, None], -1, c3)
                       for c3 in view_coords]

        scatters = []
        for c3, vs, pcr in zip(view_coords, self.voxel_size,
                               self.point_cloud_range):
            c4 = batch_coords(c3, bidx)
            nx = math.ceil((pcr[3] - pcr[0]) / vs[0])
            ny = math.ceil((pcr[4] - pcr[1]) / vs[1])
            nz = max(1, math.ceil((pcr[5] - pcr[2]) / vs[2]))
            scatters.append(build_scatter(c4, (b, nx, ny, nz),
                                          self.max_voxels,
                                          key_order=(0, 2, 1, 3)))

        # reference concat order (pillar_mvf_encoder.py:230-235):
        # per-view stats first, extra point channels last
        feats = []
        for i, (vp, sc, vs, pcr) in enumerate(zip(
                view_pts, scatters, self.voxel_size,
                self.point_cloud_range)):
            pvsc = PointVoxelStatsCalculator(
                voxel_size=vs, point_cloud_range=pcr,
                with_covariance=self.with_covariance,
                name=f'stats_{i}')
            feats.append(pvsc(vp[:, :3], sc))
        feats.append(flat[:, 3:])
        x = jnp.concatenate(feats, -1)
        valid = ~invalid

        def pointnet(name, inp):
            y = nn.Dense(self.feat_channels, use_bias=False,
                         name=f'{name}_fc')(inp)
            y = MaskedBatchNorm(axis_name=self.axis_name,
                                name=f'{name}_bn')(
                y, mask=valid, use_running_average=not train)
            return nn.relu(y)

        x1 = pointnet('pointnet1', x)

        mvf = []
        for i, (view, vp, sc, vs, pcr) in enumerate(zip(
                self.views, view_pts, scatters, self.voxel_size,
                self.point_cloud_range)):
            net = SingleViewNet(feat_channels=self.feat_channels,
                                voxel_size=vs, point_cloud_range=pcr,
                                reduce_op=self.reduce_op,
                                axis_name=self.axis_name,
                                name=f'view_{view}')
            mvf.append(net(vp[:, :3], x1, sc, b, train))
        mvf.append(pointnet('pointnet2', x1))
        fused = pointnet('pointnet3', jnp.concatenate(mvf, -1))

        pillar = scatters[0].reduce(fused, self.reduce_op)
        pcr0, vs0 = self.point_cloud_range[0], self.voxel_size[0]
        nx0 = math.ceil((pcr0[3] - pcr0[0]) / vs0[0])
        ny0 = math.ceil((pcr0[4] - pcr0[1]) / vs0[1])
        return pillar, scatters[0].voxel_coords, (nx0, ny0)
