"""Hard (padded) voxelization + dense BEV canvas scatter.

TPU-native replacement for mmdet3d's ``Voxelization`` CUDA op (imported by the
reference at ``models/detectors/pillar_od.py:2`` / ``pv_rcnn.py:4``) and the
``PointPillarsScatter`` middle encoder.  Instead of per-point atomics the hard
path sorts points by voxel key once and derives
  * the compact voxel id per point (via :func:`build_scatter`), and
  * each point's *rank* inside its voxel (position - segment start on the
    sorted order), which turns "first ``max_points`` per voxel" into a single
    static-shape scatter.

Determinism note: the reference runs ``deterministic=False`` hard voxelization
(config ``hv_pointpillars_secfpn_kitti.py:10``) — point-to-slot assignment is
race-dependent.  Here assignment is by ascending point index, deterministic by
construction.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .scatter import Scatter, build_scatter, compute_voxel_coords


class HardVoxels(NamedTuple):
    voxels: jax.Array       # (max_voxels, max_points, C) padded features
    coords: jax.Array       # (max_voxels, K) int32, -1 rows unused
    num_points: jax.Array   # (max_voxels,) clipped to max_points
    scatter: Scatter        # underlying dynamic mapping


def hard_voxelize(points, coords, spatial_shape: Sequence[int],
                  max_points: int, max_voxels: int,
                  key_order=None) -> HardVoxels:
    """Pad-pack points into (max_voxels, max_points, C) slots.

    Args:
        points: (N, C) float features (xyz + extras).
        coords: (N, K) int voxel coords (-1 rows invalid); K=3 single sample,
            K=4 batched with batch first.
        spatial_shape: extents for key linearization (len K).
        max_points: per-voxel capacity (reference KITTI pillars: 32).
        max_voxels: voxel capacity (reference: 16000 train / 40000 test).
    """
    scatter = build_scatter(coords, spatial_shape, max_voxels,
                            key_order=key_order)
    n = points.shape[0]

    # Rank of each point within its voxel, in ascending point-index order.
    # build_scatter's key argsort already groups voxels with ascending point
    # index inside each (argsort is stable) — reuse it, no second sort.
    seg = scatter.point_voxel_ids
    order = scatter.sort_order
    seg_sorted = seg[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([
        jnp.ones((1,), jnp.bool_), seg_sorted[1:] != seg_sorted[:-1]])
    seg_start = jax.lax.cummax(jnp.where(first, pos, 0))
    rank_sorted = pos - seg_start
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    keep = (seg < max_voxels) & (rank < max_points)
    v = jnp.where(keep, seg, max_voxels)
    p = jnp.where(keep, rank, 0)
    voxels = jnp.zeros((max_voxels + 1, max_points, points.shape[1]),
                       dtype=points.dtype)
    voxels = voxels.at[v, p].set(points)[:max_voxels]

    num_points = jnp.minimum(scatter.voxel_counts, max_points)
    return HardVoxels(voxels=voxels, coords=scatter.voxel_coords,
                      num_points=num_points, scatter=scatter)


def dynamic_voxelize(points, point_cloud_range, voxel_size):
    """Points -> integer voxel coords only (reference dynamic path,
    ``dynamic_centerpoint.py:16-36``)."""
    coords, grid = compute_voxel_coords(points[..., :3], point_cloud_range,
                                        voxel_size)
    return coords, grid


CANVAS_KEY_ORDER = (0, 2, 1, 3)   # (b, iy, ix, iz): build_scatter key_order
                                  # that compacts voxels in canvas raster
                                  # order -> sorted BEV scatter indices


def bev_scatter(voxel_feats, coords, batch_size: int, nx: int, ny: int,
                indices_sorted: bool = False):
    """Scatter per-voxel features onto a dense NHWC BEV canvas.

    The TPU analogue of ``PointPillarsScatter`` (referenced at
    ``models/voxel_encoders/pillar_mvf_encoder.py:10``): output is
    ``(B, ny, nx, C)`` — NHWC, the native TPU conv layout, rather than the
    reference's NCHW canvas.

    Args:
        voxel_feats: (V, C).
        coords: (V, 4) int32 as (batch, ix, iy, iz) or (batch, ix, iy);
            -1 rows are dropped.
        indices_sorted: pass True when the voxel rows are compacted in
            (b, iy, ix) canvas raster order (``build_scatter`` with
            ``key_order=CANVAS_KEY_ORDER``; -1 tail rows map to the trash
            row which sorts last) — the sorted segment-sum splat is 3.2x
            faster than the unsorted scatter-add on TPU (5.8 -> 1.8 ms at
            KITTI b4 scale).
    """
    b = coords[:, 0]
    ix = coords[:, 1]
    iy = coords[:, 2]
    valid = ((b >= 0) & (b < batch_size) & (ix >= 0) & (ix < nx)
             & (iy >= 0) & (iy < ny))
    # Invalid rows: zero their features and route them to a trash row one
    # past the canvas.  Measured on v5e (64k voxels -> 4x432x496x64): the
    # trash-row scatter runs at 1.2 ms; routing invalids into the LAST REAL
    # cell instead (num_segments == ncell exactly) de-specializes XLA's
    # sorted-segment-sum lowering to a 12 ms serialized scatter.  Zeroing
    # the features is semantically redundant given the dropped row but
    # measured faster than scattering live values (1.2 vs 1.6 ms).
    lin = jnp.where(valid, (b * ny + iy) * nx + ix, batch_size * ny * nx)
    feats = jnp.where(valid[:, None], voxel_feats, 0)
    canvas = jax.ops.segment_sum(
        feats, lin, num_segments=batch_size * ny * nx + 1,
        indices_are_sorted=indices_sorted)
    return canvas[:-1].reshape(batch_size, ny, nx, voxel_feats.shape[-1])


def bev_gather(canvas, coords):
    """Inverse of :func:`bev_scatter`: sample canvas rows at voxel coords."""
    bsz, ny, nx, c = canvas.shape
    b, ix, iy = coords[:, 0], coords[:, 1], coords[:, 2]
    valid = ((b >= 0) & (b < bsz) & (ix >= 0) & (ix < nx)
             & (iy >= 0) & (iy < ny))
    lin = jnp.where(valid, (b * ny + iy) * nx + ix, 0)
    flat = canvas.reshape(-1, c)
    out = flat[lin]
    return jnp.where(valid[:, None], out, 0.0)
