"""Point-sharded trainable PointPillars: the new scale axis, end to end.

The reference scales only by per-GPU batch division (SURVEY.md §2.11); the
BASELINE.json north star makes the point cloud itself a sharded axis.  This
module provides a full trainable model where ``points`` is partitioned over
a mesh axis *within* each sample:

  - the per-point MLP (where the per-point FLOPs are) runs on local point
    slices — pointwise ops commute with sharding, so GSPMD keeps them local;
  - pillars are built by a dense-canvas segment-sum: every chip scatters its
    partial sums into the (ny*nx) canvas and XLA merges the partials with
    one ICI all-reduce (the GSPMD lowering of scatter-add over a sharded
    update axis) — the same two-phase merge as
    ``point_sharding.sharded_pillar_reduce`` but differentiable and inside
    the training graph;
  - the BEV trunk (SECOND/FPN/head) continues batch-sharded as usual.

Everything is expressed with ``jax.lax.with_sharding_constraint`` under a
``Mesh`` context — no shard_map, no manual collectives; XLA places psums.
BatchNorm statistics are plain global reductions, which GSPMD lowers to
cross-chip means automatically (the SyncBN analogue for the point axis).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.scatter import compute_voxel_coords
from ..models.backbones import SECOND, SECONDFPN
from ..models.dense_heads.anchor3d_head import Anchor3DHeadConvs
from ..models.voxel_encoders import MaskedBatchNorm


def _constrain(x, spec):
    """Apply a PartitionSpec constraint if a mesh context is active."""
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except (ValueError, RuntimeError):
        return x   # no mesh context (single-device unit tests)


class DensePillarEncoder(nn.Module):
    """Pointwise MLP + differentiable dense-canvas mean reduce.

    Unlike :class:`DynamicPillarFeatureNet` (sort-based ``Scatter``), the
    pillar table here IS the BEV canvas, so no compaction/sort is needed —
    the whole encoder is pointwise math + one scatter-add, both of which
    GSPMD shards cleanly along the point axis.
    """
    feat_channels: Sequence[int] = (64,)
    voxel_size: Sequence[float] = (0.16, 0.16, 4.0)
    point_cloud_range: Sequence[float] = (0., -39.68, -3., 69.12, 39.68, 1.)
    point_spec: Optional[Any] = None     # PartitionSpec for (B, N, ...) ops
    # 'dense': GSPMD scatter-add + canvas all-reduce.  'sparse': explicit
    # two-phase COO merge (compaction + one all_to_all to stripe owners) —
    # needs ``mesh`` + axis names; differentiable (point_sharding.
    # sharded_feature_splat_sparse).  ICI traffic model in PARITY.md.
    merge: str = 'dense'
    mesh: Optional[Any] = None
    data_axis: str = 'data'
    point_axis: str = 'points'
    bucket_capacity: Optional[int] = None

    @nn.compact
    def __call__(self, points, points_mask, nx: int, ny: int,
                 train: bool = False):
        """points (B, N, C) -> canvas (B, ny, nx, C_out)."""
        b, n, _ = points.shape
        vs = jnp.asarray(self.voxel_size)
        pcr = jnp.asarray(self.point_cloud_range[:3])

        coords, _ = jax.vmap(
            lambda p: compute_voxel_coords(p[:, :3], self.point_cloud_range,
                                           self.voxel_size))(points)
        coords = jnp.where(points_mask[..., None], coords, -1)
        valid = jnp.all(coords >= 0, axis=-1)                # (B, N)
        # offset from the pillar center: the geometric feature every pillar
        # encoder in the reference family uses
        center = (coords[..., :2].astype(points.dtype) + 0.5) * vs[:2] \
            + pcr[:2]
        x = jnp.concatenate([points, points[..., :2] - center], axis=-1)
        if self.point_spec is not None:
            x = _constrain(x, self.point_spec)
        mflat = valid.reshape(-1)
        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False, name=f'linear_{i}')(x)
            x = MaskedBatchNorm(name=f'norm_{i}')(
                x.reshape(b * n, ch), mask=mflat,
                use_running_average=not train).reshape(b, n, ch)
            x = nn.relu(x)
            if self.point_spec is not None:
                x = _constrain(x, self.point_spec)

        lin = jnp.where(valid, coords[..., 1] * nx + coords[..., 0], nx * ny)
        if self.merge == 'sparse':
            if self.mesh is None:
                raise ValueError(
                    "merge='sparse' needs an explicit mesh= (the COO merge "
                    "is a shard_map over the point axis)")
            # explicit sparse COO merge: per-chip local reduce, stripe
            # compaction, one all_to_all to stripe owners (+ all_gather)
            from .point_sharding import sharded_feature_splat_sparse
            table = sharded_feature_splat_sparse(
                x, lin.astype(jnp.int32), valid, nx, ny, self.mesh,
                data_axis=self.data_axis, point_axis=self.point_axis,
                bucket_capacity=self.bucket_capacity,
                replicate_out=True)                # (B, ny, nx, C+1)
            cnt = jnp.maximum(table[..., -1:], 1.0)
            return table[..., :-1] / cnt
        # differentiable dense-canvas mean: scatter-add partials per chip,
        # XLA all-reduces the (small) canvas across the point axis
        ones = valid.astype(x.dtype)[..., None]
        data = jnp.concatenate([x * ones, ones], axis=-1)

        def scatter_one(d, idx):
            table = jnp.zeros((nx * ny + 1, d.shape[-1]), d.dtype)
            return table.at[idx].add(d)[:-1]

        table = jax.vmap(scatter_one)(data, lin)             # (B, ny*nx, C+1)
        cnt = jnp.maximum(table[..., -1:], 1.0)
        canvas = (table[..., :-1] / cnt).reshape(b, ny, nx, -1)
        return canvas


class ShardedPointPillarsNet(nn.Module):
    """Trainable trunk with the point axis sharded across chips."""
    voxel_size: Sequence[float] = (0.16, 0.16, 4.0)
    point_cloud_range: Sequence[float] = (0., -39.68, -3., 69.12, 39.68, 1.)
    encoder_cfg: Dict[str, Any] = None
    backbone_cfg: Dict[str, Any] = None
    neck_cfg: Dict[str, Any] = None
    head_cfg: Dict[str, Any] = None
    data_axis: str = 'data'
    point_axis: Optional[str] = 'points'
    merge: str = 'dense'                 # 'dense' | 'sparse'
    mesh: Optional[Any] = None           # required for merge='sparse'
    bucket_capacity: Optional[int] = None

    def _grid(self) -> Tuple[int, int]:
        pcr, vs = self.point_cloud_range, self.voxel_size
        nx = int(round((pcr[3] - pcr[0]) / vs[0]))
        ny = int(round((pcr[4] - pcr[1]) / vs[1]))
        return nx, ny

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        from jax.sharding import PartitionSpec as P
        nx, ny = self._grid()
        pspec = (P(self.data_axis, self.point_axis)
                 if self.point_axis else None)
        if pspec is not None:
            points = _constrain(points, P(self.data_axis, self.point_axis,
                                          None))
            points_mask = _constrain(points_mask, pspec)
        enc_cfg = dict(self.encoder_cfg or {})
        enc_cfg.pop('in_channels', None)
        encoder = DensePillarEncoder(
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            point_spec=(P(self.data_axis, self.point_axis, None)
                        if self.point_axis else None),
            merge=self.merge, mesh=self.mesh,
            data_axis=self.data_axis,
            point_axis=self.point_axis or 'points',
            bucket_capacity=self.bucket_capacity,
            name='voxel_encoder', **enc_cfg)
        canvas = encoder(points, points_mask, nx, ny, train=train)
        if self.point_axis:
            canvas = _constrain(
                canvas, P(self.data_axis, None, None, None))
        backbone = SECOND(name='backbone', **(self.backbone_cfg or {}))
        neck = SECONDFPN(name='neck', **(self.neck_cfg or {}))
        feats = neck(backbone(canvas, train=train), train=train)
        head = Anchor3DHeadConvs(name='bbox_head', **(self.head_cfg or {}))
        return head(feats)
