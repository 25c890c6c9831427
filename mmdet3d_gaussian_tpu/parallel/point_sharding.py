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


def _compact_and_pack(stripes, live, cap: int, stripe_cells: int):
    """Compact each stripe's live cells into ``cap`` (feature, cell-id) rows.

    stripes (..., S, F); live (..., S) -> packed (..., cap, F+1).

    * Live cells beyond ``cap`` are DROPPED, highest cell index first
      (deterministic) — callers must size ``cap`` >= live cells per
      (chip, stripe); there is no in-graph overflow signal (a jit-safe
      counter would cost a reduction per step), so treat capacity like
      ``max_voxels``: a static bound chosen from data statistics.
    * The id lane must stay integer-exact through the float payload: bf16
      (7 mantissa bits) corrupts ids > 256, so the payload is promoted to
      f32 when the dtype can't represent ``stripe_cells`` (costs 2x ICI
      bytes for bf16 inputs; a base-256 two-lane digit pack would recover
      it if this ever shows up in profiles).
    """
    idx = jnp.arange(stripe_cells)
    rank = jnp.where(live, idx, stripe_cells + idx)
    _, sel = jax.lax.top_k(-rank, cap)                  # (..., cap) asc ids
    frag = jnp.take_along_axis(stripes, sel[..., None], axis=-2)
    frag_live = jnp.take_along_axis(live, sel, axis=-1)
    cell = jnp.where(frag_live, sel, stripe_cells)      # trash slot
    dt = stripes.dtype
    route_dt = (dt if jnp.finfo(dt).nmant >= 23
                or stripe_cells < 2 ** jnp.finfo(dt).nmant
                else jnp.float32)
    return jnp.concatenate([frag.astype(route_dt),
                            cell[..., None].astype(route_dt)], axis=-1)


def sharded_pillar_reduce_sparse(points, mask, pc_range, voxel_size,
                                 nx: int, ny: int, mesh: Mesh,
                                 axis: str = 'data', op: str = 'mean',
                                 bucket_capacity: Optional[int] = None,
                                 replicate_out: bool = True):
    """Sparse two-phase cross-chip pillar merge (SURVEY.md §2.11 north star;
    the alternative VERDICT r1 weak #3 asked for).

    Instead of all-reducing the full dense canvas (55 MB/sample ICI traffic
    at KITTI 432x496x64), each chip:

      1. locally segment-reduces its point slice into its dense partial
         canvas (no comms — same as the dense path);
      2. COMPACTS the live pillar fragments of each of the n canvas
         y-stripes into ``bucket_capacity`` (cell_id, feature) COO rows;
      3. routes fragments to the stripe-owner chip with ONE
         ``all_to_all`` — traffic = n_dev * capacity * (C+2) * 4 B per chip
         (~8 MB at capacity 4k, C 64) instead of the canvas size;
      4. the owner scatter-reduces received fragments into its stripe.

    Returns the canvas y-row-sharded over ``axis`` (out_specs P(axis)),
    ready for spatially-sharded convs; ``replicate_out=True`` all-gathers
    to the replicated canvas instead (then total traffic matches a
    reduce-scatter + all-gather = one all-reduce, so only use replication
    for parity checks).  Capacity overflow drops the LOWEST-index cells
    last (deterministic) — callers size ``bucket_capacity`` >= live pillars
    per (chip, stripe); defaults to one-quarter of the stripe cells.

    op: 'sum' | 'mean' | 'max'.
    """
    n = mesh.shape[axis]
    assert ny % n == 0, (ny, n)
    rows_per = ny // n
    stripe_cells = rows_per * nx
    cap = bucket_capacity or max(128, stripe_cells // 4)
    cap = min(cap, stripe_cells)

    def fn(pts, m):
        table = _local_dense_reduce(pts, m, pc_range, voxel_size, nx, ny,
                                    op)                       # (ny*nx, F)
        f = table.shape[-1]
        empty_val = -jnp.inf if op == 'max' else 0.0
        live = (jnp.any(table != empty_val, axis=-1)
                if op == 'max' else jnp.any(table != 0.0, axis=-1))
        stripes = table.reshape(n, stripe_cells, f)
        live = live.reshape(n, stripe_cells)

        # (n, cap, F+1) feature rows + cell id, routed to stripe owners
        # (drop policy + id-exactness notes: _compact_and_pack)
        packed = _compact_and_pack(stripes, live, cap, stripe_cells)
        recv = jax.lax.all_to_all(packed, axis, split_axis=0,
                                  concat_axis=0, tiled=False)  # (n, cap, F+1)

        rcell = recv[..., -1].astype(jnp.int32).reshape(-1)
        rfeat = recv[..., :-1].reshape(-1, f).astype(pts.dtype)
        if op == 'max':
            own = jnp.full((stripe_cells + 1, f), -jnp.inf, pts.dtype)
            own = own.at[rcell].max(rfeat)[:stripe_cells]
            own = jnp.where(jnp.isfinite(own), own, 0.0)
            out = own
        else:
            own = jnp.zeros((stripe_cells + 1, f), pts.dtype)
            own = own.at[rcell].add(rfeat)[:stripe_cells]
            if op == 'mean':
                own = own[:, :-1] / jnp.maximum(own[:, -1:], 1.0)
            else:
                own = own[:, :-1]
            out = own
        out = out.reshape(rows_per, nx, -1)
        if replicate_out:
            out = jax.lax.all_gather(out, axis, axis=0,
                                     tiled=True)              # (ny, nx, C)
        return out

    out_spec = P() if replicate_out else P(axis)
    # check_vma=False: the final tiled all_gather does replicate the canvas,
    # but shard_map's static replication checker cannot infer that.
    return jax.shard_map(fn, mesh=mesh, in_specs=(P(axis), P(axis)),
                         out_specs=out_spec,
                         check_vma=False)(points, mask)


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


def sharded_feature_splat_sparse(feats, lin, valid, nx: int, ny: int,
                                 mesh: Mesh, data_axis: str = 'data',
                                 point_axis: str = 'points',
                                 bucket_capacity: Optional[int] = None,
                                 replicate_out: bool = True):
    """Differentiable sparse cross-chip pillar merge for TRAINING graphs.

    The feature-level sibling of :func:`sharded_pillar_reduce_sparse`:
    inputs are per-point features already produced by the (point-sharded)
    MLP, so this drops into :class:`parallel.sharded_model.DensePillarEncoder`
    as the pillar merge.  Every op in the path (scatter-add, top_k
    compaction, ``all_to_all``, ``all_gather``) has a JAX transpose, so the
    whole merge is differentiable end to end.

    Capacity is a STATIC bound like ``max_voxels``: live cells beyond
    ``bucket_capacity`` per (chip, stripe) are dropped deterministically
    with no in-graph signal (see :func:`_compact_and_pack`) — size it from
    data statistics, or use merge='dense' when occupancy is unbounded.

    Args:
        feats: (B, N, C) sharded P(data_axis, point_axis, None).
        lin:   (B, N) int32 global BEV cell id (y * nx + x); invalid rows
               may hold anything.
        valid: (B, N) bool.
        replicate_out: True -> (B, ny, nx, C+1) canvas (sum + count lanes)
               replicated over ``point_axis``; False -> y-row-sharded
               P(data_axis, point_axis) stripes (B, ny/n, nx, C+1).
    """
    assert mesh is not None, \
        "sharded_feature_splat_sparse needs an explicit Mesh (merge='sparse')"
    n = mesh.shape[point_axis]
    assert ny % n == 0, (ny, n)
    rows_per = ny // n
    stripe_cells = rows_per * nx
    cap = bucket_capacity or max(128, stripe_cells // 4)
    cap = min(cap, stripe_cells)

    def fn(f, li, va):
        b_loc, n_loc, c = f.shape
        ones = va.astype(f.dtype)[..., None]
        data = jnp.concatenate([f * ones, ones], axis=-1)       # (b, n, C+1)
        li = jnp.where(va, li, ny * nx)

        def one_sample(d, idx):
            table = jnp.zeros((ny * nx + 1, d.shape[-1]), d.dtype)
            return table.at[idx].add(d)[:-1]

        table = jax.vmap(one_sample)(data, li)          # (b, ny*nx, C+1)
        fdim = table.shape[-1]
        stripes = table.reshape(b_loc, n, stripe_cells, fdim)
        live = stripes[..., -1] > 0                     # (b, n, S)

        # (b, n, cap, F+1) fragments routed to stripe owners (drop policy
        # + id-exactness notes: _compact_and_pack)
        packed = _compact_and_pack(stripes, live, cap, stripe_cells)
        recv = jax.lax.all_to_all(packed, point_axis, split_axis=1,
                                  concat_axis=1, tiled=False)

        rcell = recv[..., -1].astype(jnp.int32).reshape(b_loc, -1)
        rfeat = recv[..., :-1].reshape(b_loc, -1, fdim).astype(f.dtype)

        def own_sample(ids, vals):
            own = jnp.zeros((stripe_cells + 1, fdim), f.dtype)
            return own.at[ids].add(vals)[:stripe_cells]

        own = jax.vmap(own_sample)(rcell, rfeat)        # (b, S, C+1)
        out = own.reshape(b_loc, rows_per, nx, fdim)
        if replicate_out:
            out = jax.lax.all_gather(out, point_axis, axis=1, tiled=True)
        return out

    out_spec = (P(data_axis) if replicate_out
                else P(data_axis, point_axis))
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(data_axis, point_axis, None), P(data_axis, point_axis),
                  P(data_axis, point_axis)),
        out_specs=out_spec, check_vma=False)(feats, lin, valid)
