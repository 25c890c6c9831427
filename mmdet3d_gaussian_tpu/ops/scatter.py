"""Dynamic point->voxel scatter, the central voxelization op — TPU-native.

Replaces the reference's CUDA dynamic scatter stack
(``/root/reference/mmdet3d_gaussian/ops/voxel/src/scatter_points_cuda.cu`` and
its wrapper ``ops/voxel/scatter.py``) with a *sort-based, deterministic,
static-shape* formulation:

* The CUDA path dedups voxel coords with ``at::unique_dim`` and reduces with
  per-point atomics (nondeterministic float sums).  On TPU we instead
  linearize voxel coords to integer keys, and use XLA ``segment_sum`` /
  ``segment_max`` over a *compacted* voxel index assigned by sorting the keys.
  Results are bit-deterministic run to run — an improvement the survey calls
  out to preserve (SURVEY.md §5 "race detection").
* Ragged voxel counts become static shapes: ``max_voxels`` is a config
  constant (mirroring the reference's ``max_voxels=(16000, 40000)``); unused
  voxel rows are masked.  Invalid points (coords outside range -> key
  sentinel) land in a trash segment that is sliced away.
* Gradient semantics match the CUDA kernels: sum/mean backward copies
  (scaled) grads back to points (``add_reduce_traceback_grad_kernel``,
  scatter_points_cuda.cu:106-134); max backward routes the gradient to the
  single contributing point, ties broken by *lowest point index*
  (``atomicMin`` traceback, scatter_points_cuda.cu:155-158) — reproduced here
  exactly via a min-index argmax reduction.  These come for free from XLA's
  ``segment_max`` VJP except the tie-break, which we pin with a custom VJP.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .scan import cummax_i32, cumsum_i32


def compute_voxel_coords(points_xyz, point_cloud_range, voxel_size):
    """Point xyz -> integer voxel coords ``(N, 3)`` as (ix, iy, iz); -1 rows
    for out-of-range points.

    Mirrors the coordinate convention of mmdet3d's dynamic ``Voxelization``
    (used by the reference at ``models/detectors/dynamic_centerpoint.py:16-36``)
    but keeps (x, y, z) order; callers decide the canvas layout.
    """
    pcr = jnp.asarray(point_cloud_range, dtype=points_xyz.dtype)
    vs = jnp.asarray(voxel_size, dtype=points_xyz.dtype)
    grid = jnp.floor((pcr[3:6] - pcr[0:3]) / vs + 0.5).astype(jnp.int32)
    coords = jnp.floor((points_xyz - pcr[0:3]) / vs).astype(jnp.int32)
    valid = jnp.all((coords >= 0) & (coords < grid), axis=-1)
    return jnp.where(valid[:, None], coords, -1), grid


class Scatter(NamedTuple):
    """Compacted point->voxel mapping (the reference ``Scatter`` object,
    ``ops/voxel/scatter.py:75-144``, rebuilt on sorted segment ids).

    Attributes:
        point_voxel_ids: (N,) int32 — compact voxel id per point in
            ``[0, max_voxels)``; invalid points get ``max_voxels`` (trash row).
        voxel_coords: (max_voxels, C) int32 — per-voxel coords
            (batch_idx first if batched); -1 rows are unused.
        voxel_counts: (max_voxels,) int32 — points per voxel (0 = unused).
        num_voxels: () int32 — number of live voxels.
        max_voxels: static python int.
    """
    point_voxel_ids: jax.Array
    voxel_coords: jax.Array
    voxel_counts: jax.Array
    num_voxels: jax.Array
    max_voxels: int
    sort_order: jax.Array    # (N,) point indices sorted by (voxel, index) —
                             # argsort of the linearized keys; lets callers
                             # (hard_voxelize) reuse the grouping for free
    num_overflow: jax.Array = 0  # () int32 — live voxels beyond capacity
                                 # (rerouted to the trash row); telemetry
                                 # for sparse-conv out_capacity sizing
    ids_sorted: bool = False     # static: point_voxel_ids ascending (points
                                 # permuted by sort_order) — unlocks XLA's
                                 # sorted segment lowering (see sorted_view)
    sorted_starts: Optional[jax.Array] = None  # (max_voxels,) first sorted
                                 # position per voxel (cummax-filled for
                                 # empties, monotone nondecreasing)
    sorted_ids: Optional[jax.Array] = None  # (N,) compact ids on the SORTED
                                 # point order (the pre-unsort form) — lets
                                 # sorted_view avoid re-gathering
                                 # point_voxel_ids through sort_order (the
                                 # unsort + re-gather pair cost ~0.9 ms at
                                 # KITTI b4 and cancels exactly)

    def sorted_view(self) -> 'Scatter':
        """Scatter over the voxel-sorted point permutation.

        Callers permute their point data once (``data[scatter.sort_order]``)
        and use the returned view for every reduce/mapback: segment ids are
        then ascending, so XLA lowers segment ops on the fast sorted path
        instead of the serialized general scatter (same class of win as the
        sorted BEV splat — see ``ops/voxelize.py::_splat``).  All per-point
        ops in between (MLP/BN/masks) are permutation-invariant; voxel-level
        outputs are identical.  The tie-break of the max backward ("lowest
        point index wins", reference scatter_points_cuda.cu:155-158) is
        preserved: argsort is stable, so within a voxel the sorted order IS
        ascending original point index.
        """
        n = self.sort_order.shape[0]
        ids = (self.sorted_ids if self.sorted_ids is not None
               else jnp.take(self.point_voxel_ids, self.sort_order))
        return self._replace(point_voxel_ids=ids,
                             sort_order=jnp.arange(n, dtype=jnp.int32),
                             ids_sorted=True)

    # -- reductions -------------------------------------------------------
    def _kernel_path(self) -> bool:
        """True when the fused Pallas segment kernel applies: rows sorted
        by voxel id and the per-voxel start table available."""
        from .pallas import segment_kernel as sk
        return (self.ids_sorted and self.sorted_starts is not None
                and sk.enabled())

    def _last_pos(self):
        """Monotone per-voxel LAST sorted row (cummax-filled empties) —
        the gather index that extracts each segment's total from the
        fused per-row result with a sorted gather."""
        ends = self.sorted_starts + self.voxel_counts
        return jnp.maximum(cummax_i32(ends) - 1, 0)

    def reduce(self, point_feats, op: str = 'max'):
        """Per-voxel reduction of point features -> (max_voxels, C)."""
        if self._kernel_path():
            from .pallas import segment_kernel as sk
            kop = 'sum' if op in ('sum', 'mean') else 'max'
            out = sk.sorted_reduce(point_feats, self.point_voxel_ids,
                                   self._last_pos(), self.voxel_counts > 0,
                                   self.max_voxels, kop)
            if op == 'mean':
                cnt = jnp.maximum(self.voxel_counts, 1).astype(out.dtype)
                out = out / cnt[:, None]
            return out.astype(point_feats.dtype)
        if op == 'sum':
            return _segment_sum_nd(point_feats, self.point_voxel_ids,
                                   self.max_voxels, self.ids_sorted)
        if op == 'mean':
            s = _segment_sum_nd(point_feats, self.point_voxel_ids,
                                self.max_voxels, self.ids_sorted)
            cnt = jnp.maximum(self.voxel_counts, 1).astype(point_feats.dtype)
            return s / cnt[:, None]
        if op == 'max':
            return segment_max_lowtie(point_feats, self.point_voxel_ids,
                                      self.max_voxels, self.ids_sorted)
        raise ValueError(f'unknown reduce op {op!r}')

    def mapback(self, voxel_feats):
        """Gather voxel features back onto points -> (N, C); invalid points
        read zeros (reference ``mapback``, scatter.py:127-131)."""
        padded = jnp.concatenate(
            [voxel_feats, jnp.zeros_like(voxel_feats[:1])], axis=0)
        return jnp.take(padded, self.point_voxel_ids, axis=0,
                        indices_are_sorted=self.ids_sorted)

    def reduce_mapback(self, point_feats, op: str = 'mean'):
        """Per-point full-segment reduction (fused when the Pallas path
        applies — no (V, C) intermediate, no mapback gather)."""
        if self._kernel_path():
            from .pallas import segment_kernel as sk
            valid = self.valid_point_mask
            if op == 'mean':
                ones = jnp.ones(point_feats.shape[:1] + (1,),
                                point_feats.dtype)
                fused = sk.sorted_reduce_mapback(
                    jnp.concatenate([point_feats, ones], axis=-1),
                    self.point_voxel_ids, valid, 'sum')
                out = fused[:, :-1] / jnp.maximum(fused[:, -1:], 1.0)
            else:
                kop = 'sum' if op == 'sum' else 'max'
                out = sk.sorted_reduce_mapback(
                    point_feats, self.point_voxel_ids, valid, kop)
            return out.astype(point_feats.dtype)
        return self.mapback(self.reduce(point_feats, op))

    @property
    def valid_voxel_mask(self):
        return self.voxel_counts > 0

    @property
    def valid_point_mask(self):
        return self.point_voxel_ids < self.max_voxels


def _segment_sum_nd(data, segment_ids, num_segments, ids_sorted=False):
    """segment_sum with a trailing trash segment stripped."""
    out = jax.ops.segment_sum(data, segment_ids,
                              num_segments=num_segments + 1,
                              indices_are_sorted=ids_sorted)
    return out[:num_segments]


# --------------------------------------------------------------------------
# max reduction with reference tie-break semantics (lowest point index wins
# the gradient), as a custom VJP.
# --------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_max_lowtie(data, segment_ids, num_segments: int,
                       ids_sorted: bool = False):
    """Per-segment max; EMPTY segments yield 0.

    Note: the reference CUDA path has no empty voxels at all (it sizes the
    output to the exact voxel count; for max it fills -inf then reduces,
    scatter_points_cuda.cu:201-204) — empty rows only exist here because of
    static-capacity padding, and zeroing them keeps padded rows inert for
    downstream BEV scatter.  Emptiness is detected by segment counts, so a
    genuine +/-inf feature value propagates instead of being masked."""
    out = jax.ops.segment_max(data, segment_ids,
                              num_segments=num_segments + 1,
                              indices_are_sorted=ids_sorted)
    out = out[:num_segments]
    counts = jax.ops.segment_sum(
        jnp.ones_like(segment_ids, dtype=jnp.int32), segment_ids,
        num_segments=num_segments + 1,
        indices_are_sorted=ids_sorted)[:num_segments]
    return jnp.where(counts[:, None] > 0, out, 0.0)


def _smax_fwd(data, segment_ids, num_segments, ids_sorted):
    out = segment_max_lowtie(data, segment_ids, num_segments, ids_sorted)
    # winner per (segment, channel): the *lowest* point index achieving the
    # max (reference atomicMin traceback, scatter_points_cuda.cu:155-158).
    n = data.shape[0]
    gathered = jnp.take(
        jnp.concatenate([out, jnp.zeros_like(out[:1])], axis=0),
        segment_ids, axis=0, indices_are_sorted=ids_sorted)
    is_max = (data == gathered) & (segment_ids < num_segments)[:, None]
    idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    cand = jnp.where(is_max, idx, n)  # n = sentinel "no winner"
    winner = jax.ops.segment_min(cand, segment_ids,
                                 num_segments=num_segments + 1,
                                 indices_are_sorted=ids_sorted)[:num_segments]
    return out, (winner, n, data.shape, segment_ids)


def _smax_bwd(num_segments, ids_sorted, res, g):
    winner, n, data_shape, segment_ids = res
    # Each point belongs to exactly one segment, so instead of scattering
    # g[v, c] to point winner[v, c] (an element-level scatter-add that
    # serializes on TPU — measured 36 ms + a 4 ms sort per step at KITTI
    # scale), every point GATHERS its segment's grad row and keeps it only
    # where it is that (segment, channel)'s winner.  Row gathers vectorize.
    g_pad = jnp.concatenate([g, jnp.zeros_like(g[:1])], axis=0)
    w_pad = jnp.concatenate(
        [winner, jnp.full_like(winner[:1], n)], axis=0)
    seg = jnp.minimum(segment_ids, num_segments)
    g_pt = jnp.take(g_pad, seg, axis=0,
                    indices_are_sorted=ids_sorted)     # (N, C)
    w_pt = jnp.take(w_pad, seg, axis=0,
                    indices_are_sorted=ids_sorted)     # (N, C)
    idx = jnp.arange(data_shape[0], dtype=winner.dtype)[:, None]
    dpoints = jnp.where(w_pt == idx, g_pt, 0.0)
    return dpoints, None


segment_max_lowtie.defvjp(_smax_fwd, _smax_bwd)


# --------------------------------------------------------------------------
# Scatter construction: sort-based dedup (replaces at::unique_dim,
# scatter_points_cuda.cu:221-251)
# --------------------------------------------------------------------------
def build_scatter(coords, spatial_shape: Sequence[int],
                  max_voxels: int,
                  key_order: Optional[Sequence[int]] = None) -> Scatter:
    """Build the compact point->voxel mapping from integer coords.

    Args:
        coords: (N, C) int32 voxel coords; a row with any value < 0 is
            invalid.  C in {3, 4}: 3 = (ix, iy, iz) single-sample; 4 =
            (batch, ix, iy, iz) batched (reference 3/4-col convention,
            scatter.py:97-113 — here vectorized, no per-sample python loop).
        spatial_shape: static extents per coord column (batch size first for
            4-col), used to linearize coords to scalar keys.
        max_voxels: static output capacity.
        key_order: optional permutation of the coord columns used ONLY for
            the sort key — it controls the order in which voxels are
            compacted.  E.g. ``(0, 2, 1, 3)`` for (b, ix, iy, iz) coords
            compacts in (b, iy, ix) canvas raster order, which makes the
            downstream BEV scatter's indices sorted (3.2x faster splat on
            TPU).  Coord values themselves are unchanged.

    Returns a :class:`Scatter`.
    """
    coords = coords.astype(jnp.int32)
    n, c = coords.shape
    assert len(spatial_shape) == c, (spatial_shape, c)

    total = 1
    for s in spatial_shape:
        total *= int(s)
    assert total < 2 ** 31 - 1, (
        f'linearized key space {total} overflows int32; shrink the grid or '
        f'split the batch axis')

    cols = list(key_order) if key_order is not None else list(range(c))
    assert sorted(cols) == list(range(c)), cols

    valid = jnp.all(coords >= 0, axis=-1)
    # Linearize; key for invalid = MAX so they sort last.
    mult = 1
    key = jnp.zeros((n,), dtype=jnp.int32)
    for d in reversed(cols):
        key = key + coords[:, d] * mult
        mult *= int(spatial_shape[d])
    int32_max = jnp.iinfo(jnp.int32).max
    key = jnp.where(valid, key, int32_max)

    # sort_kv instead of argsort-then-gather: one fused sort pass
    # (measured 0.15 ms at N=360k on v5e — sorts are NOT the bottleneck;
    # see tools/misc/bench_row_ops.py)
    sorted_key, order = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    # new-segment flags on the sorted keys
    first = jnp.concatenate([
        jnp.ones((1,), dtype=jnp.int32),
        (sorted_key[1:] != sorted_key[:-1]).astype(jnp.int32)])
    first = jnp.where(sorted_key == int32_max, 0, first)
    seg_sorted = cumsum_i32(first) - 1  # compact id in sorted order
    # live voxels actually materialized (overflow beyond capacity is
    # rerouted to the trash row and NOT counted)
    num_live = jnp.maximum(seg_sorted[-1] + 1, 0)
    num_voxels = jnp.clip(num_live, 0, max_voxels)
    num_overflow = jnp.maximum(num_live - max_voxels, 0)
    # invalid points and overflow voxels -> trash id max_voxels
    seg_sorted = jnp.where(
        (sorted_key == int32_max) | (seg_sorted >= max_voxels),
        max_voxels, seg_sorted).astype(jnp.int32)

    # unsort back to original point order: inverse permutation via ONE
    # more pair-sort (order is a permutation, so sorting (order, value)
    # by key leaves value[i] = seg_sorted at point i's sorted slot).
    # A sort is ~0.04 ms at N=65k on v5e; the old `.at[order].set(...)`
    # scatter measured ~0.47 ms because its lowering serializes.
    _, point_voxel_ids = jax.lax.sort(
        (order, seg_sorted), num_keys=1)

    # Per-voxel start offsets / counts WITHOUT segment reductions, binary
    # searches (searchsorted = log2(N) serialized gather passes, ~8 ms at
    # V=64k) or scatters (the old one-column `.at[ids].set(pos)` tables
    # carried ~63k duplicate trash-row writes, which de-specialize XLA's
    # scatter to ~0.3 ms each).  Sorting (id-or-trash, pos) pairs puts the
    # k-th live voxel's entry exactly at slot k (live ids are 0..L-1,
    # unique, ascending; trash keys sort last), so the dense table is a
    # SLICE of the sort output.  (compact_indices-based tables were
    # measured SLOWER here at V=64k: +2.3 ms/step — the chunked-scan
    # machinery beats sorts only for small k, e.g. the loss's K=1024
    # positive selection.)
    pos = jnp.arange(n, dtype=jnp.int32)
    last = jnp.concatenate([
        (seg_sorted[1:] != seg_sorted[:-1]),
        jnp.ones((1,), jnp.bool_)])
    first_ids = jnp.where(first.astype(bool), seg_sorted, max_voxels)
    last_ids = jnp.where(last, seg_sorted, max_voxels)
    if n < max_voxels:          # sorted table must cover max_voxels slots
        tpad = (0, max_voxels - n)
        first_ids = jnp.pad(first_ids, tpad, constant_values=max_voxels)
        last_ids = jnp.pad(last_ids, tpad, constant_values=max_voxels)
        pos_k = jnp.pad(pos, tpad)
    else:
        pos_k = pos
    skey, sval = jax.lax.sort((first_ids, pos_k), num_keys=1)
    starts = jnp.where(skey[:max_voxels] < max_voxels,
                       sval[:max_voxels], 0)
    ekey, eval_ = jax.lax.sort((last_ids, pos_k + 1), num_keys=1)
    ends = jnp.where(ekey[:max_voxels] < max_voxels,
                     eval_[:max_voxels], 0)
    voxel_counts = jnp.maximum(ends - starts, 0)
    # empty voxels keep starts=0 which would break the monotone-gather
    # trick downstream; cummax fills them with the previous live start
    starts = cummax_i32(starts)

    # representative coords per voxel = coords of its FIRST sorted member
    # (members share coords): two small gathers, no segment_min (row
    # gathers are ~10x cheaper than the segment reduce at this scale)
    live = voxel_counts > 0
    rep = jnp.take(order, jnp.minimum(starts, n - 1))       # (V,) point idx
    voxel_coords = jnp.where(live[:, None],
                             jnp.take(coords, rep, axis=0), -1)

    return Scatter(point_voxel_ids=point_voxel_ids,
                   voxel_coords=voxel_coords,
                   voxel_counts=voxel_counts,
                   num_voxels=num_voxels.astype(jnp.int32),
                   max_voxels=max_voxels,
                   sort_order=order.astype(jnp.int32),
                   num_overflow=num_overflow.astype(jnp.int32),
                   sorted_starts=starts,
                   sorted_ids=seg_sorted)


def batch_coords(coords_3d, batch_idx):
    """Prepend a batch column: (N,3)+(N,) -> (N,4); keeps -1 invalid rows."""
    invalid = jnp.any(coords_3d < 0, axis=-1)
    b = jnp.where(invalid, -1, batch_idx.astype(jnp.int32))
    return jnp.concatenate([b[:, None], coords_3d], axis=-1)
