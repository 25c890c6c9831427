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

from .scan import cummax_i32
from .scatter import Scatter, build_scatter, compute_voxel_coords


class HardVoxels(NamedTuple):
    voxels: jax.Array       # (max_voxels, max_points, C) padded features
    coords: jax.Array       # (max_voxels, K) int32, -1 rows unused
    num_points: jax.Array   # (max_voxels,) clipped to max_points
    scatter: Scatter        # underlying dynamic mapping


def hard_voxelize(points, coords, spatial_shape: Sequence[int],
                  max_points: int, max_voxels: int,
                  key_order=None, mask_slots: bool = True) -> HardVoxels:
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

    # Pack by GATHER, entirely in the sorted domain.  The round-2 form
    # unsorted rank/seg back to point order and row-scattered (N, C) point
    # rows into the (V, P, C) table, which serializes at ~50 ns/row on TPU
    # (~18 ms at Waymo b2; tools/misc/bench_row_ops.py).  Row scatters are
    # the most expensive primitive measured; row GATHERS with ascending
    # indices are the cheapest — so the pack reads pts_sorted at
    # starts[v] + p instead of writing points to (v, p).  Same result,
    # deterministic first-max_points-by-ascending-index semantics.
    order = scatter.sort_order
    counts = scatter.voxel_counts                        # (V,)
    num_points = jnp.minimum(counts, max_points)
    starts = scatter.sorted_starts                       # (V,) monotone

    # voxels[v, p] = pts_sorted[starts[v] + p] for p < count_v: a GATHER
    # with globally ASCENDING indices (clamp empty slots to the voxel's
    # last member, mask after), which hits XLA's fast sorted-gather path.
    # (A single windowed gather of V (P, C) blocks — lax.gather with
    # slice_sizes=(P, C) — would cut the row count 20x but lowers to a
    # fully SERIALIZED slice loop on TPU: measured 87.6 ms of voxelize at
    # Waymo b2 vs 9.3 ms for this per-slot row-gather form.)
    pts_sorted = jnp.take(points, order, axis=0)         # (N, C) row gather
    slot = jnp.arange(max_points, dtype=jnp.int32)[None, :]
    last = jnp.maximum(num_points[:, None] - 1, 0)
    # Empty voxels: ``starts`` is cummax-filled with the previous live
    # START, which steps BACKWARDS from that voxel's last gathered row and
    # would violate the indices_are_sorted promise below.  Route empties to
    # the monotone previous live LAST row instead (cummax of ends - 1), so
    # the flattened src is genuinely non-decreasing.
    ends_mono = jnp.maximum(
        cummax_i32(starts + counts) - 1, 0)
    base = jnp.where(num_points > 0, starts.astype(jnp.int32), ends_mono)
    src = base[:, None] + jnp.minimum(slot, last)
    src = jnp.minimum(src, n - 1)                        # tail guard
    gathered = jnp.take(pts_sorted, src.reshape(-1), axis=0,
                        indices_are_sorted=True).reshape(
                            max_voxels, max_points, points.shape[1])
    if mask_slots:
        valid_slot = slot < num_points[:, None]
        voxels = jnp.where(valid_slot[..., None], gathered, 0)
    else:
        # consumer masks by num_points itself (PillarFeatureNet applies
        # fmask to the mean and the feature concat): skip one full write
        # + read of the (V, P, C) table, whose (P, C) minor dims tile-pad
        # ~5x in HBM (0.7 ms/step at Waymo b2).  Invalid slots then hold
        # neighbor-voxel rows, NOT zeros.
        voxels = gathered

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


from functools import partial

# BEV splat forward implementation: 'auto' uses the Pallas kernel on TPU
# (canvas values bf16-rounded — the precision XLA's conv lowering feeds the
# MXU from this canvas anyway; see ops/pallas/bev_splat_kernel.py), the XLA
# segment-sum elsewhere.  'xla' forces the bit-exact f32 segment-sum path.
# Default stays 'xla' until the bf16 kernel is e2e-validated on hardware.
SPLAT_IMPL = 'xla'   # 'auto' | 'xla' | 'pallas'


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _splat(voxel_feats, lin, ncell: int, indices_sorted: bool):
    """(V, C) rows -> (ncell, C) canvas; rows with lin >= ncell dropped.

    Forward dispatch:
      * TPU + sorted-unique rows: Pallas window-DMA one-hot-matmul splat
        (``ops/pallas/bev_splat_kernel.py``) — no trash row, no slice;
        0.63 ms vs 1.97 ms on v5e at KITTI b4 scale.
      * otherwise: sorted segment-sum into ``ncell + 1`` rows (trash row
        sliced off).  Measured on v5e (64k voxels -> 4x432x496x64): the
        trash-row scatter runs at 1.2 ms; routing invalids into the LAST
        REAL cell instead (num_segments == ncell exactly) de-specializes
        XLA's sorted-segment-sum lowering to a 12 ms serialized scatter,
        and ``.at[].add(mode='drop')`` hits the same slow path (11.8 ms).
    """
    # kernel preconditions: window fits (V >= TR+ALIGN), DMA-alignable V,
    # packable row (C + 3 id digits <= 128 lanes), f32-exact cell ids
    v, c = voxel_feats.shape
    use_pallas = (indices_sorted and v >= 528 and v % 16 == 0
                  and c <= 124 and ncell < (1 << 24)
                  and SPLAT_IMPL != 'xla'
                  and (SPLAT_IMPL == 'pallas'
                       or jax.default_backend() == 'tpu'))
    if use_pallas:
        # bf16 canvas: the values are bf16-rounded by the kernel's MXU
        # matmul either way, and the canvas consumers (backbone convs)
        # read bf16 operands even from an f32 canvas — see kernel module
        # docstring.  Halves canvas HBM traffic.
        from .pallas.bev_splat_kernel import bev_splat_pallas
        return bev_splat_pallas(voxel_feats, lin, ncell)
    feats = jnp.where((lin < ncell)[:, None], voxel_feats, 0)
    canvas = jax.ops.segment_sum(feats, lin, num_segments=ncell + 1,
                                 indices_are_sorted=indices_sorted)
    return canvas[:-1]


def _splat_fwd(voxel_feats, lin, ncell, indices_sorted):
    res = (lin, jnp.zeros((0,), voxel_feats.dtype))
    return _splat(voxel_feats, lin, ncell, indices_sorted), res


def _splat_bwd(ncell, indices_sorted, res, g):
    # Gather with out-of-bounds fill replaces segment_sum's natural VJP,
    # which pads the canvas gradient back to ncell + 1 rows first — a full
    # 219 MB copy at KITTI b4 scale (~1.3 ms/step on v5e).
    lin, proto = res
    gi = jnp.take(g, lin, axis=0, mode='fill', fill_value=0,
                  indices_are_sorted=indices_sorted, unique_indices=False)
    return gi.astype(proto.dtype), None


_splat.defvjp(_splat_fwd, _splat_bwd)


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
            row which sorts last) — the sorted splat is >3x faster than
            the unsorted scatter-add on TPU, and unlocks the Pallas
            window-DMA kernel (see :func:`_splat`).
    """
    b = coords[:, 0]
    ix = coords[:, 1]
    iy = coords[:, 2]
    valid = ((b >= 0) & (b < batch_size) & (ix >= 0) & (ix < nx)
             & (iy >= 0) & (iy < ny))
    ncell = batch_size * ny * nx
    lin = jnp.where(valid, (b * ny + iy) * nx + ix, ncell)
    canvas = _splat(voxel_feats, lin, ncell, indices_sorted)
    return canvas.reshape(batch_size, ny, nx, voxel_feats.shape[-1])


def bev_scatter_s2d(voxel_feats, coords_s2d, batch_size: int,
                    nx2: int, ny2: int, indices_sorted: bool = True):
    """Space-to-depth BEV splat: pillars -> ``(B, ny2, nx2, 4*C)`` canvas.

    Each 2x2 block of BEV pillars lands in ONE canvas cell, the four
    parities stacked on channels (parity index ``(iy&1)*2 + (ix&1)``).
    With C=64 pillar features the s2d canvas carries 256 channels — full
    128-lane tiles — whereas the plain (B, ny, nx, 64) canvas pads 64->128
    lanes and therefore costs 2x its logical bytes in HBM on every splat,
    slice, conv read and backward pass (the canvas is the largest tensor
    in the PointPillars program).  The stride-2 first backbone conv
    consumes this layout exactly via the folded 2x2 kernel
    (``models/backbones.py::fold_s2d_kernel``), so the composite is
    numerically the SAME function as splat + 3x3/s2 conv.

    Args:
        voxel_feats: (V, C) pillar features.
        coords_s2d: (V, 4) int32 rows ``(b, cy, cx, parity)`` (-1 invalid),
            compacted in cell raster order (build_scatter on the s2d key),
            so the splat's segment ids are non-decreasing with up to four
            rows (parities) per cell — parities occupy disjoint channel
            blocks, so the segment-sum is a pure placement.
    """
    vb, vcy, vcx = coords_s2d[:, 0], coords_s2d[:, 1], coords_s2d[:, 2]
    vpar = coords_s2d[:, 3]
    valid = ((vb >= 0) & (vb < batch_size) & (vcx >= 0) & (vcx < nx2)
             & (vcy >= 0) & (vcy < ny2))
    ncell = batch_size * ny2 * nx2
    c = voxel_feats.shape[-1]
    # Sub-cell splat at 128-lane rows: rows are sorted by (cell, parity) —
    # see the caller's s2d key (models/detectors/voxelnet.py, parity
    # minor) — so splatting 2C-wide parity-PAIR rows at id cell*2 +
    # parity//2 into ncell*2 sub-rows is sorted too, and the
    # (ncell*2, 2C) -> (ncell, 4C) reshape is a row-major bitcast that
    # reproduces the parity-major channel blocks.  vs the 4x-masked
    # (V, 4C) concat: half the select/concat traffic and the backward
    # fill-gather reads 2C-wide rows.  (The full cell*4+parity split at
    # C=64-wide rows was measured WORSE — 64-lane minor pads to 128, so
    # the sub-canvas paid 2x HBM; 2C=128 keeps full lanes.)
    lin2 = jnp.where(valid, ((vb * ny2 + vcy) * nx2 + vcx) * 2 + vpar // 2,
                     ncell * 2)
    canvas = _splat_pairs(voxel_feats, lin2, vpar & 1, ncell * 2,
                          indices_sorted)
    return canvas.reshape(batch_size, ny2, nx2, 4 * c)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _splat_pairs(feats, lin2, par, ncell2: int, indices_sorted: bool):
    """(V, C) rows -> (ncell2, 2C) paired canvas; row i lands in lane half
    ``par[i]`` of paired row ``lin2[i]`` (rows with lin2 >= ncell2 drop).

    TPU + sorted rows + bf16: Pallas window-DMA one-hot-matmul kernel
    (``ops/pallas/bev_splat_kernel.py::bev_splat_pairs_pallas``) — the XLA
    sorted segment-sum serializes ~15 ns/row (0.59 ms at KITTI b4).
    Elsewhere: masked lane-half concat + segment-sum (trash-row form)."""
    v, c = feats.shape
    from .pallas.bev_splat_kernel import _WP
    use_pallas = (indices_sorted and v >= _WP and v % 16 == 0
                  and c <= 124 and 2 * c <= 128 and ncell2 < (1 << 24)
                  and feats.dtype == jnp.bfloat16
                  and SPLAT_IMPL != 'xla'
                  and (SPLAT_IMPL == 'pallas'
                       or jax.default_backend() == 'tpu'))
    if use_pallas:
        from .pallas.bev_splat_kernel import bev_splat_pairs_pallas
        return bev_splat_pairs_pallas(feats, lin2, par, ncell2)
    lo = (par == 0)[:, None]
    feats2 = jnp.concatenate([jnp.where(lo, feats, 0),
                              jnp.where(lo, 0, feats)], axis=1)
    return _splat(feats2, lin2, ncell2, indices_sorted)


def _splat_pairs_fwd(feats, lin2, par, ncell2, indices_sorted):
    out = _splat_pairs(feats, lin2, par, ncell2, indices_sorted)
    return out, (lin2, par, jnp.zeros((0,), feats.dtype),
                 feats.shape[-1])


def _splat_pairs_bwd(ncell2, indices_sorted, res, g):
    lin2, par, proto, c = res
    gi = jnp.take(g, lin2, axis=0, mode='fill', fill_value=0,
                  indices_are_sorted=indices_sorted, unique_indices=False)
    gf = jnp.where((par == 0)[:, None], gi[:, :c], gi[:, c:])
    return gf.astype(proto.dtype), None, None


_splat_pairs.defvjp(_splat_pairs_fwd, _splat_pairs_bwd)


def bev_scatter_wfold(voxel_feats, coords_fold, batch_size: int,
                      nx2: int, ny: int, indices_sorted: bool = True):
    """W-folded BEV splat: pillars -> ``(B, ny, nx/2, 2*C)`` canvas.

    The W-only sibling of :func:`bev_scatter_s2d` for stride-1 first
    stages (reference Waymo config): adjacent W-pixels share a canvas
    cell with the two parities stacked on channels (parity ``ix & 1``),
    filling all 128 lanes at C=64.  ``models/backbones.py`` stage 0 then
    runs entirely in this layout via ``fold_w2_kernel``.

    Args:
        coords_fold: (V, 4) int32 rows ``(b, iy, cx, parity)`` (-1
            invalid), compacted in (b, iy, cx) raster order.
    """
    vb, viy, vcx = coords_fold[:, 0], coords_fold[:, 1], coords_fold[:, 2]
    vpar = coords_fold[:, 3]
    valid = ((vb >= 0) & (vb < batch_size) & (vcx >= 0) & (vcx < nx2)
             & (viy >= 0) & (viy < ny))
    ncell = batch_size * ny * nx2
    lin = jnp.where(valid, (vb * ny + viy) * nx2 + vcx, ncell)
    c = voxel_feats.shape[-1]
    feats2 = jnp.concatenate(
        [jnp.where((vpar == k)[:, None], voxel_feats, 0) for k in range(2)],
        axis=1)
    canvas = _splat(feats2, lin, ncell, indices_sorted)
    return canvas.reshape(batch_size, ny, nx2, 2 * c)


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
