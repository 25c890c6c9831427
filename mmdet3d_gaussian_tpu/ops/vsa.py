"""Point set-abstraction ops: FPS, ball query, grouping — pure JAX.

Replaces the reference's stacked-batch CUDA kernels
(``/root/reference/mmdet3d_gaussian/ops/vsa/src/{sampling,ball_query,
group_points}.cu`` and wrappers ``ops/vsa/{sample_points,group_points}.py``)
with padded-batch formulations:

* :func:`furthest_point_sample` — iterative FPS via ``lax.fori_loop`` over a
  running min-distance array (the CUDA shared-memory tree reduction becomes
  an argmax per step).  Non-differentiable, like the reference.
* :func:`ball_query` — fixed-radius neighbors with the reference's exact
  padding semantics (``ball_query.cu:12-72``): the first ``nsample`` support
  points (ascending index) within ``radius``; empty slots repeat the FIRST
  hit; a query with no hits yields all ``-1``.
* :func:`group_points` / :func:`query_and_group` — gather by neighbor index
  with zeroed empty balls, center-relative coords, optional xyz concat
  (reference ``QueryAndGroup.forward``, ``group_points.py:110-183``).

All shapes static; invalid support points are masked via ``support_mask``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def furthest_point_sample(points_xyz, num_samples: int, valid_mask=None):
    """(N, 3) -> (num_samples,) int32 indices.  Starts from index 0 (the
    CUDA kernel's convention).  Invalid points are never selected (their
    distance is pinned to -inf)."""
    n = points_xyz.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)

    big = jnp.asarray(1e10, points_xyz.dtype)
    min_d = jnp.where(valid_mask, big, -1.0)

    def body(i, carry):
        min_d, idx, last = carry
        d = jnp.sum((points_xyz - points_xyz[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, jnp.where(valid_mask, d, -1.0))
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        return min_d, idx, nxt

    idx0 = jnp.zeros((num_samples,), jnp.int32)
    first = jnp.argmax(valid_mask).astype(jnp.int32)  # first valid point
    idx0 = idx0.at[0].set(first)
    _, idx, _ = jax.lax.fori_loop(1, num_samples, body,
                                  (min_d, idx0, first))
    return idx


def ball_query(radius: float, nsample: int, support_xyz, query_xyz,
               support_mask=None):
    """(N, 3) support x (M, 3) query -> (M, nsample) int32 indices.

    Reference semantics (``ball_query.cu``): first ``nsample`` in-radius
    support indices in ascending order; pad with the first hit; all -1 when
    the ball is empty.
    """
    n = support_xyz.shape[0]
    if support_mask is None:
        support_mask = jnp.ones((n,), bool)
    d2 = jnp.sum(
        (query_xyz[:, None, :] - support_xyz[None, :, :]) ** 2, axis=-1)
    # STRICT inequality like the kernel (ball_query.cu:58 `d2 < radius2`)
    in_ball = (d2 < radius * radius) & support_mask[None, :]    # (M, N)

    # First nsample hits by ascending support index — K rounds of
    # row-vectorized min + knockout.  NOT lax.top_k: under vmap it pair-
    # sorts every (N,) row (bitonic, ~log^2 N passes over the (M, N)
    # matrix — ~75 ms per call at M=2048, N=32k on v5e); K min-reduce
    # passes are ~5x cheaper at the nsample<=32 this op is used with.
    rank = jnp.where(in_ball, jnp.arange(n, dtype=jnp.int32)[None, :], n)
    cols = []
    r = rank
    for _ in range(nsample):
        nxt = jnp.min(r, axis=1)                                # (M,)
        cols.append(nxt)
        r = jnp.where(r <= nxt[:, None], n, r)
    neg_sorted = jnp.stack(cols, axis=1)                        # (M, K) asc
    has = neg_sorted < n
    first_hit = neg_sorted[:, 0:1]
    idx = jnp.where(has, neg_sorted, first_hit)
    any_hit = has[:, 0:1]
    return jnp.where(any_hit, idx, -1).astype(jnp.int32)


def group_points(features, idx):
    """features (N, C), idx (M, K) -> (M, K, C); idx -1 reads zeros."""
    safe = jnp.clip(idx, 0)
    out = features[safe]
    return jnp.where((idx >= 0)[..., None], out, 0.0)


def query_and_group(radius: float, nsample: int, support_xyz, query_xyz,
                    features=None, support_mask=None, use_xyz: bool = True,
                    normalize_xyz: bool = False):
    """QueryAndGroup (reference ``group_points.py:110-183``).

    Returns (grouped (M, K, C'), idx (M, K)) where C' = 3 [+ C] when
    ``use_xyz``; relative coords are centered on the query point and zeroed
    for empty balls.
    """
    idx = ball_query(radius, nsample, support_xyz, query_xyz, support_mask)
    grouped_xyz = group_points(support_xyz, idx) - query_xyz[:, None, :]
    grouped_xyz = jnp.where((idx >= 0)[..., None], grouped_xyz, 0.0)
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    assert use_xyz or features is not None, (
        'query_and_group needs use_xyz=True or a features tensor '
        '(reference QueryAndGroup asserts the same)')
    parts = []
    if use_xyz:
        parts.append(grouped_xyz)
    if features is not None:
        parts.append(group_points(features, idx))
    return jnp.concatenate(parts, axis=-1), idx


def voxel_query(query_xyz, voxel_coords_dense, point_cloud_range, voxel_size,
                max_range: Tuple[int, int, int], nsample: int,
                radius: float = None):
    """Neighbor search over a dense voxel hash within a +-range window
    (reference ``voxel_query_gpu.cu:10-89``): candidate voxel cells in the
    window whose CENTER lies within ``radius`` of the query point, first
    ``nsample`` in the z-outer / x-inner traversal order of the reference
    kernel.  ``radius=None`` skips the metric filter (pure window query)."""
    pcr = jnp.asarray(point_cloud_range)
    vs = jnp.asarray(voxel_size)
    cell = jnp.floor((query_xyz - pcr[:3]) / vs).astype(jnp.int32)
    rz, ry, rx = max_range
    # z-outer / y-mid / x-inner traversal like the CUDA triple loop
    oz, oy, ox = jnp.meshgrid(jnp.arange(-rz, rz + 1),
                              jnp.arange(-ry, ry + 1),
                              jnp.arange(-rx, rx + 1), indexing='ij')
    offsets = jnp.stack([ox.ravel(), oy.ravel(), oz.ravel()], -1)  # (W, 3)
    nz, ny, nx = voxel_coords_dense.shape
    cand = cell[:, None, :] + offsets[None, :, :]               # (M, W, 3)
    ok = ((cand[..., 0] >= 0) & (cand[..., 0] < nx)
          & (cand[..., 1] >= 0) & (cand[..., 1] < ny)
          & (cand[..., 2] >= 0) & (cand[..., 2] < nz))
    if radius is not None:
        centers = (cand.astype(query_xyz.dtype) + 0.5) * vs + pcr[:3]
        d2 = jnp.sum((centers - query_xyz[:, None, :]) ** 2, -1)
        ok = ok & (d2 <= radius * radius)
    safe = jnp.where(ok[..., None], cand, 0)
    vid = voxel_coords_dense[safe[..., 2], safe[..., 1], safe[..., 0]]
    vid = jnp.where(ok, vid, -1)
    # first nsample valid ids in traversal order
    w = vid.shape[1]
    rank = jnp.where(vid >= 0, jnp.arange(w)[None, :], w)
    order = jnp.argsort(rank, axis=1)[:, :nsample]
    sel = jnp.take_along_axis(vid, order, axis=1)
    return sel.astype(jnp.int32)
