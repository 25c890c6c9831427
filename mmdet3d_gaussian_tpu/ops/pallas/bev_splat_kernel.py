"""Pallas TPU kernel: sorted-voxel -> dense BEV canvas splat.

The XLA path (``ops/voxelize.py::_splat``) lowers to a sorted segment-sum
into ``ncell + 1`` rows followed by a full-canvas slice — at KITTI b4 scale
(4x496x432x64 = 219 MB canvas) the scatter runs far from HBM speed of light
and the slice re-copies the whole canvas (1.97 ms fwd measured on v5e).

This kernel exploits what XLA cannot be told: the compacted voxel rows are
*unique* cells already sorted in canvas raster order (``build_scatter`` with
``key_order=CANVAS_KEY_ORDER``; invalid rows carry the sentinel ``ncell``
and sort last).  Within any ``TR`` consecutive canvas rows there are
therefore at most ``TR`` source voxels — one contiguous window of the input.
The grid walks canvas row-blocks; a scalar-prefetched ``searchsorted``
table gives each block its input window, which is double-buffer DMA'd into
VMEM and splatted with one-hot matmuls on the MXU:

    canvas[gTR : (g+1)TR] = onehot(lin_window - gTR)^T @ feats_window

Rows outside the block (rel < 0, rel >= TR — including the sentinel) never
match the iota, so no masking pass is needed.

Mosaic constraints (measured): manual-DMA slices must be 128-lane aligned,
so the wrapper packs features and the cell id into one ``(V, 128)`` array.
The cell id is split into three base-256 digit lanes — exact in bf16
(integers < 256) as well as f32 — so the packed array can be bf16 end to
end, halving HBM traffic in both directions.

Precision contract: the MXU runs the one-hot matmul with bf16 operands
(Mosaic supports only DEFAULT / HIGHEST dot precision; HIGHEST is bit-exact
but 6-pass, measured 4.74 ms vs 0.63 ms at KITTI b4 — slower than the XLA
segment-sum it replaces).  Canvas VALUES are therefore bf16-rounded.  This
matches what the canvas consumer already sees: XLA's TPU conv lowering
feeds the MXU bf16 operands from this canvas even in the all-f32 program
(``--xla_allow_excess_precision``; verified in the step trace — the
segment-sum canvas is sliced straight to bf16).  The op's VJP is computed
by an f32 fill-gather (``ops/voxelize.py::_splat_bwd``).  Callers that
need a bit-exact f32 canvas (CPU parity tests) use the XLA path via
``ops.voxelize.SPLAT_IMPL``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 512     # canvas rows (= max source voxels) per grid step
_ALIGN = 16   # DMA sublane alignment (bf16 tiling)
_W = _TR + _ALIGN   # input window rows (start aligned down, so +ALIGN)
_LANES = 128  # packed row width (Mosaic DMA lane alignment)


def _splat_kernel(starts_ref, aug_hbm, out_ref, buf, sems, *, c: int):
    g = pl.program_id(0)
    ng = pl.num_programs(0)

    def dma(slot, blk):
        # table holds start // ALIGN; multiplying back lets Mosaic prove
        # the dynamic slice offset is sublane-tile aligned
        s = starts_ref[blk] * _ALIGN
        return pltpu.make_async_copy(aug_hbm.at[pl.ds(s, _W), :],
                                     buf.at[slot], sems.at[slot])

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < ng)
    def _():
        dma((g + 1) % 2, g + 1).start()

    slot = g % 2
    dma(slot, g).wait()

    window = buf[slot]                                   # (W, 128)
    ids = (window[:, c:c + 1].astype(jnp.float32) * 65536.0
           + window[:, c + 1:c + 2].astype(jnp.float32) * 256.0
           + window[:, c + 2:c + 3].astype(jnp.float32))
    base = (g * _TR).astype(jnp.float32)
    relb = jnp.broadcast_to(ids - base, (_W, _LANES))
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (_W, _LANES), 1).astype(jnp.float32)
    for k in range(_TR // _LANES):
        onehot = (relb == lane + (k * _LANES)).astype(window.dtype)
        acc = jax.lax.dot_general(
            onehot, window,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (LANES, 128)
        out_ref[k * _LANES:(k + 1) * _LANES, :] = acc[:, :c].astype(
            out_ref.dtype)


def _count_below(lin, ng: int, tr: int):
    """starts[g] = #rows with lin < g*tr — vectorized compare-count
    (equivalent to sorted searchsorted 'left' since lin is sorted)."""
    grid = jnp.arange(ng, dtype=jnp.int32) * tr
    return jnp.sum(lin[None, :] < grid[:, None], axis=1,
                   dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Parity-pair variant: C-wide source rows -> 2C-wide paired canvas rows.
# Two sorted source rows (parities 0/1) may share one output row, landing in
# disjoint lane halves — the s2d sub-cell layout of ops/voxelize.py::
# bev_scatter_s2d.  Window must cover up to 2*TR source rows per TR output
# rows (two parities per cell).
_TRP = 512            # output pair-rows per grid step
_WP = 2 * _TRP + _ALIGN


def _splat_pairs_kernel(starts_ref, aug_hbm, out_ref, buf, sems, *, c: int):
    g = pl.program_id(0)
    ng = pl.num_programs(0)

    def dma(slot, blk):
        s = starts_ref[blk] * _ALIGN
        return pltpu.make_async_copy(aug_hbm.at[pl.ds(s, _WP), :],
                                     buf.at[slot], sems.at[slot])

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < ng)
    def _():
        dma((g + 1) % 2, g + 1).start()

    slot = g % 2
    dma(slot, g).wait()

    window = buf[slot]                                   # (WP, 128)
    ids = (window[:, c:c + 1].astype(jnp.float32) * 65536.0
           + window[:, c + 1:c + 2].astype(jnp.float32) * 256.0
           + window[:, c + 2:c + 3].astype(jnp.float32))
    par = window[:, c + 3:c + 4].astype(jnp.float32)     # 0.0 lo / 1.0 hi
    base = (g * _TRP).astype(jnp.float32)
    relb = jnp.broadcast_to(ids - base, (_WP, _LANES))
    parb = jnp.broadcast_to(par, (_WP, _LANES))
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (_WP, _LANES), 1).astype(jnp.float32)
    lo_b = parb == 0.0
    hi_b = parb == 1.0
    for k in range(_TRP // _LANES):
        hit = relb == lane + (k * _LANES)
        oh_lo = (hit & lo_b).astype(window.dtype)
        oh_hi = (hit & hi_b).astype(window.dtype)
        acc_lo = jax.lax.dot_general(
            oh_lo, window, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (LANES, 128)
        acc_hi = jax.lax.dot_general(
            oh_hi, window, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[k * _LANES:(k + 1) * _LANES, :c] = acc_lo[:, :c].astype(
            out_ref.dtype)
        out_ref[k * _LANES:(k + 1) * _LANES, c:] = acc_hi[:, :c].astype(
            out_ref.dtype)


@partial(jax.jit, static_argnums=(3, 4, 5))
def bev_splat_pairs_pallas(feats, lin2, par, ncell2: int, out_dtype=None,
                           interpret: bool = False):
    """Splat sorted C-wide rows into a (ncell2, 2C) paired canvas.

    Args:
        feats: (V, C) rows, C <= 124 - 1 (one lane goes to the parity bit).
        lin2: (V,) int32 paired-cell ids, sorted non-decreasing; up to TWO
            rows share an id (one per parity); invalid rows hold a
            sentinel >= ncell2 (sorted last).
        par: (V,) int32 in {0, 1} — lane half of each row (0 -> [0, C),
            1 -> [C, 2C)).
        ncell2: static paired-cell count (< 2^24).
    Returns (ncell2, 2C) canvas (bf16 by default; see module precision
    contract — both halves of a pair are pure placements, the matmul only
    ever sums disjoint-lane contributions).
    """
    v, c = feats.shape
    if (c > _LANES - 4 or 2 * c > _LANES or v < _WP or v % _ALIGN
            or ncell2 >= (1 << 24)):
        raise ValueError(f'unsupported pair-splat V={v} C={c} {ncell2}')
    out_dtype = out_dtype or jnp.bfloat16
    pack_dtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    ng = -(-ncell2 // _TRP)
    # first row with lin2 >= g*TRP by compare-count, NOT jnp.searchsorted
    # (which lowers to a serialized while loop on TPU — measured +2.7
    # ms/step at KITTI b4 when this path went live)
    starts = _count_below(lin2, ng, _TRP)
    starts = jnp.minimum(starts // _ALIGN, (v - _WP) // _ALIGN)

    digits = jnp.stack([lin2 // 65536, (lin2 // 256) % 256, lin2 % 256],
                       axis=1).astype(pack_dtype)
    aug = jnp.concatenate([
        feats.astype(pack_dtype), digits,
        par[:, None].astype(pack_dtype),
        jnp.zeros((v, _LANES - c - 4), pack_dtype)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_TRP, 2 * c), lambda g, starts: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, _WP, _LANES), pack_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(_splat_pairs_kernel, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng * _TRP, 2 * c), out_dtype),
        interpret=interpret,
    )(starts, aug)
    return out[:ncell2]


@partial(jax.jit, static_argnums=(2, 3, 4))
def bev_splat_pallas(feats, lin, ncell: int, out_dtype=None,
                     interpret: bool = False):
    """Splat sorted-unique voxel rows onto a dense (ncell, C) canvas.

    Args:
        feats: (V, C) voxel features, V >= _TR, C <= 124.
        lin: (V,) int32 linear canvas cell ids, sorted ascending, unique for
            valid rows; invalid rows hold a sentinel >= ncell (sorted last).
        ncell: static canvas cell count (< 2^24).
        out_dtype: canvas dtype; bf16 (default) halves HBM traffic and loses
            nothing — values are bf16-rounded either way (see module doc).
    Returns (ncell, C) canvas; cells without a voxel are zero.
    """
    v, c = feats.shape
    if c > _LANES - 4 or v < _W or v % _ALIGN or ncell >= (1 << 24):
        raise ValueError(f'unsupported splat shape V={v} C={c} {ncell}')
    out_dtype = out_dtype or jnp.bfloat16
    pack_dtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    ng = -(-ncell // _TR)
    # Input window per block: first source row with lin >= g*TR, aligned
    # down to the DMA sublane granularity and clamped so the fixed-size
    # window stays in bounds (rows pulled in early by the align/clamp have
    # rel < 0 / >= TR and never match the iota).
    starts = _count_below(lin, ng, _TR)        # see pairs variant: NOT
    starts = jnp.minimum(starts // _ALIGN,     # jnp.searchsorted (serial
                         (v - _W) // _ALIGN)   # while loop); ALIGN units

    digits = jnp.stack([lin // 65536, (lin // 256) % 256, lin % 256],
                       axis=1).astype(pack_dtype)        # exact: ints < 256
    aug = jnp.concatenate([
        feats.astype(pack_dtype), digits,
        jnp.zeros((v, _LANES - c - 3), pack_dtype)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_TR, c), lambda g, starts: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, _W, _LANES), pack_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(_splat_kernel, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng * _TR, c), out_dtype),
        interpret=interpret,
    )(starts, aug)
    return out[:ncell]
