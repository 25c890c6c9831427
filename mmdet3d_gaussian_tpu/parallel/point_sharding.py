"""Point-axis sharding: voxelization + pillar reduce across chips.

The reference's only scale axis is per-GPU batch division (SURVEY.md §2.11).
Here the point cloud itself is a first-class sharded axis — the BASELINE.json
north star: shard points across chips *within* a sample, segment-reduce
locally, and merge pillars that span shards with one ICI collective.

Mechanism (two-phase segment reduce, the TPU answer to "a pillar's points may
land on two chips"):
  1. every chip owns a slice of the point axis and computes voxel coords
     locally;
  2. the pillar table is addressed by a GLOBAL linearized voxel key modulo a
     fixed capacity (open addressing is unnecessary: we use the exact
     dense-key -> slot mapping computed identically on all chips via a
     shared sort of a replicated key sample is avoided — instead each chip
     scatters into a capacity-sized table indexed by ``key % capacity`` with
     collision-free guarantee when capacity >= number of BEV cells, or by
     the caller-provided exact table);
  3. partial sums/counts (or maxes) are merged with ``psum`` / ``pmax`` over
     the mesh axis — XLA emits one fused all-reduce on ICI.

For BEV pillar grids the canvas is small enough (e.g. KITTI 432*496 = 214k
cells) that the table can be the *dense* canvas itself — phase 2's psum then
doubles as the BEV scatter, fusing voxelization straight into the canvas.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.scatter import compute_voxel_coords


def _local_dense_reduce(points, mask, pc_range, voxel_size, nx, ny, op):
    """One shard's partial dense-canvas reduction.

    points (n_local, C); returns (ny*nx, C[+1]) partial sums (+count) or
    maxes.
    """
    coords, _ = compute_voxel_coords(points[:, :3], pc_range, voxel_size)
    coords = jnp.where(mask[:, None], coords, -1)
    valid = jnp.all(coords >= 0, axis=-1)
    lin = jnp.where(valid, coords[:, 1] * nx + coords[:, 0], ny * nx)

    if op == 'max':
        table = jnp.full((ny * nx + 1, points.shape[1]), -jnp.inf,
                         points.dtype)
        table = table.at[lin].max(jnp.where(valid[:, None], points,
                                            -jnp.inf))
        return table[:-1]
    ones = valid.astype(points.dtype)[:, None]
    data = jnp.concatenate([points * ones, ones], axis=-1)
    table = jnp.zeros((ny * nx + 1, data.shape[1]), points.dtype)
    table = table.at[lin].add(data)
    return table[:-1]


def sharded_pillar_reduce(points, mask, pc_range, voxel_size,
                          nx: int, ny: int, mesh: Mesh,
                          axis: str = 'data', op: str = 'mean'):
    """Point-sharded dense pillar reduction over a mesh axis.

    Args:
        points: (N, C) — N sharded over ``axis`` (N % n_devices == 0).
        mask: (N,) validity.
        op: 'sum' | 'mean' | 'max'.
    Returns:
        (ny, nx, C) canvas, replicated (each chip holds the merged result).

    The local scatter-adds run per chip on their point slice; the single
    ``psum``/``pmax`` merges cross-chip pillar fragments over ICI.
    """
    def fn(pts, m):
        partial_table = _local_dense_reduce(pts, m, pc_range, voxel_size,
                                            nx, ny, op)
        if op == 'max':
            merged = jax.lax.pmax(partial_table, axis)
            merged = jnp.where(jnp.isfinite(merged), merged, 0.0)
            return merged.reshape(ny, nx, -1)
        merged = jax.lax.psum(partial_table, axis)
        if op == 'mean':
            cnt = jnp.maximum(merged[:, -1:], 1.0)
            merged = merged[:, :-1] / cnt
        else:
            merged = merged[:, :-1]
        return merged.reshape(ny, nx, -1)

    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(P(axis), P(axis)),
                         out_specs=P())(points, mask)


def reference_pillar_reduce(points, mask, pc_range, voxel_size, nx, ny,
                            op: str = 'mean'):
    """Single-device oracle with identical semantics."""
    table = _local_dense_reduce(points, mask, pc_range, voxel_size, nx, ny,
                                op)
    if op == 'max':
        table = jnp.where(jnp.isfinite(table), table, 0.0)
        return table.reshape(ny, nx, -1)
    if op == 'mean':
        cnt = jnp.maximum(table[:, -1:], 1.0)
        return (table[:, :-1] / cnt).reshape(ny, nx, -1)
    return table[:, :-1].reshape(ny, nx, -1)
