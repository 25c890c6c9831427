"""Pallas TPU kernel: fused sorted-segment reduce + mapback (the dynamic
PFN's hot op pair).

XLA executes the dynamic-PFN segment machinery row-serialized at
~8.6 ns/row regardless of row width (PARITY.md trace: six ~3 ms segment /
compaction fusions plus four ~2.4 ms mapback gathers = ~30 ms/step at
Waymo-dynamic scale).  The reference's CUDA equivalent is the atomics
scatter in ``scatter_points_cuda.cu:60-104`` + the ``mapback`` gather
(``ops/voxel/scatter.py:127-131``).

This kernel computes the FUSED form directly: for every (sorted) point
row, the full reduction over its segment —

    out[i, c] = reduce_{j : ids[j] == ids[i]} data[j, c]

i.e. ``Scatter.reduce_mapback`` in one shot, from which ``reduce`` is a
single cheap sorted row-gather at the segment end positions.  Because the
rows are sorted by segment id (``Scatter.sorted_view``), segments are
contiguous runs and the whole op is two data-oblivious passes:

* **pass 1 (forward)**: per tile of TM rows, an inclusive *segmented
  scan* down the sublane axis (log2(TM) shift+combine steps on the VPU),
  with a (1, C) carry in VMEM scratch chaining tiles — TPU grids run
  sequentially, so scratch persists across grid steps.  Emits the
  running prefix-reduce per row (and, for max, the *exclusive* prefix —
  needed for the lowest-index-wins gradient tie-break).
* **pass 2 (reverse)**: grid walked back-to-front; each row copies the
  value at the LAST row of its segment (reverse segmented broadcast,
  same log2(TM) doubling), with a carry handing the finished totals of
  boundary-spanning segments to earlier tiles.

Static shapes throughout, no scalar prefetch, no data-dependent windows;
rows are padded to a tile multiple with trash ids.  Accumulation is f32
regardless of the input dtype.

Gradient semantics match ``ops/scatter.py`` exactly:
* sum: the fused op is self-adjoint (its matrix is the symmetric
  same-segment indicator), so the VJP is the op itself;
* max: gradient flows to the LOWEST point index achieving the max
  (reference ``scatter_points_cuda.cu:155-158`` atomicMin traceback),
  detected as ``(x == total) & (first_in_segment | x > exclusive_prefix)``.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set by tests to run through the Pallas interpreter on CPU.
INTERPRET = False

# Dispatch for the Scatter integration: 'auto' = kernel on TPU when the
# ids are sorted; 'xla' forces the segment-op path; 'pallas' forces the
# kernel (tests set INTERPRET too).
IMPL = os.environ.get('MMDET3D_TPU_SEGMENT_KERNEL', 'auto')

_TM = 512          # rows per tile (sublane axis); must be a power of two
_NEG = -3.4e38     # ~f32 min, neutral for max


def enabled() -> bool:
    if IMPL == 'xla':
        return False
    if IMPL == 'pallas' or INTERPRET:
        return True
    return jax.default_backend() == 'tpu'


# --------------------------------------------------------------------------
# pass 1: forward segmented inclusive scan (+ exclusive prefix for max)
# --------------------------------------------------------------------------
def _shift_down(x, d, fill):
    """Rows shift down by d: row i reads row i-d; top d rows read fill."""
    top = jnp.full_like(x[:d], fill)
    return jnp.concatenate([top, x[:-d]], axis=0)


def _fwd_kernel(ids_ref, x_ref, y_ref, *rest,
                op: str, tm: int, want_pe: bool):
    pe_ref, cid_ref, cval_ref = rest if want_pe else (None,) + rest
    neutral = 0.0 if op == 'sum' else _NEG
    comb = (lambda a, b: a + b) if op == 'sum' else jnp.maximum

    @pl.when(pl.program_id(0) == 0)
    def _init():
        cid_ref[0, 0] = jnp.int32(-1)
        cval_ref[...] = jnp.full_like(cval_ref, neutral)

    ids = ids_ref[...]                       # (TM, 1) int32
    x = x_ref[...].astype(jnp.float32)       # (TM, C)
    # exclusive prefix needs the d=1 step's mask before the scan mutates y
    if want_pe:
        same1 = ids == _shift_down(ids, 1, jnp.int32(-2))
    # inclusive segmented scan down the rows
    y = x
    d = 1
    while d < tm:
        same = ids == _shift_down(ids, d, jnp.int32(-2))
        y = jnp.where(same, comb(y, _shift_down(y, d, neutral)), y)
        d *= 2
    # exclusive prefix (within tile): row i-1's inclusive value, same seg
    if want_pe:
        pe = jnp.where(same1, _shift_down(y, 1, neutral),
                       jnp.full_like(y, neutral))
    # carry-in: rows of the first segment continue the previous tile
    first_id = ids_ref[0, 0]
    first_seg = ids == first_id
    carried = first_seg & (cid_ref[0, 0] == first_id)
    cval = cval_ref[...]                     # (1, C)
    y = jnp.where(carried, comb(y, cval), y)
    if want_pe:
        pe = jnp.where(carried, comb(pe, cval), pe)
        pe_ref[...] = pe
    # carry-out: last row's inclusive value (includes carry-in if chained)
    cid_ref[0, 0] = ids_ref[tm - 1, 0]
    cval_ref[...] = y[tm - 1:tm]
    y_ref[...] = y


# --------------------------------------------------------------------------
# pass 2: reverse segmented broadcast-from-last-row
# --------------------------------------------------------------------------
def _shift_up(x, d, fill):
    """Rows shift up by d: row i reads row i+d; bottom d rows read fill."""
    bot = jnp.full_like(x[:d], fill)
    return jnp.concatenate([x[d:], bot], axis=0)


def _bwd_kernel(ids_ref, y_ref, out_ref, nid_ref, nval_ref, *, tm: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        nid_ref[0, 0] = jnp.int32(-1)
        nval_ref[...] = jnp.zeros_like(nval_ref)

    ids = ids_ref[...]
    z = y_ref[...]
    # every row takes the value of the LAST row of its segment (in-tile)
    d = 1
    while d < tm:
        same = ids == _shift_up(ids, d, jnp.int32(-2))
        z = jnp.where(same, _shift_up(z, d, 0.0), z)
        d *= 2
    # rows whose segment spans into the NEXT tile get its finished total
    cont = ids == nid_ref[0, 0]
    z = jnp.where(cont, nval_ref[...], z)
    # carry to the previous tile: first row's segment total
    nid_ref[0, 0] = ids_ref[0, 0]
    nval_ref[...] = z[0:1]
    out_ref[...] = z.astype(out_ref.dtype)


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------
def _pad_rows(data, ids, tm):
    n = data.shape[0]
    npad = (-n) % tm
    if npad:
        data = jnp.concatenate(
            [data, jnp.zeros((npad,) + data.shape[1:], data.dtype)], axis=0)
        ids = jnp.concatenate(
            [ids, jnp.full((npad,), jnp.iinfo(jnp.int32).max - 1,
                           jnp.int32)], axis=0)
    return data, ids, n


def _fused_raw(data, ids, op: str, want_pe: bool):
    """Per-row full-segment reduce over sorted ids.  Returns (out, pe)."""
    tm = _TM
    data, ids, n = _pad_rows(data, ids.astype(jnp.int32), tm)
    np_, c = data.shape
    ng = np_ // tm
    ids2 = ids[:, None]

    outs = [jax.ShapeDtypeStruct((np_, c), jnp.float32)]
    out_specs = [pl.BlockSpec((tm, c), lambda g: (g, 0))]
    if want_pe:
        outs.append(jax.ShapeDtypeStruct((np_, c), jnp.float32))
        out_specs.append(pl.BlockSpec((tm, c), lambda g: (g, 0)))
    fwd = pl.pallas_call(
        partial(_fwd_kernel, op=op, tm=tm, want_pe=want_pe),
        grid=(ng,),
        in_specs=[pl.BlockSpec((tm, 1), lambda g: (g, 0)),
                  pl.BlockSpec((tm, c), lambda g: (g, 0))],
        out_specs=out_specs if want_pe else out_specs[0],
        out_shape=outs if want_pe else outs[0],
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32),
                        pltpu.VMEM((1, c), jnp.float32)],
        interpret=INTERPRET,
    )(ids2, data)
    y = fwd[0] if want_pe else fwd
    pe = fwd[1] if want_pe else None

    rev = lambda g: (ng - 1 - g, 0)
    out = pl.pallas_call(
        partial(_bwd_kernel, tm=tm),
        grid=(ng,),
        in_specs=[pl.BlockSpec((tm, 1), rev),
                  pl.BlockSpec((tm, c), rev)],
        out_specs=pl.BlockSpec((tm, c), rev),
        out_shape=jax.ShapeDtypeStruct((np_, c), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32),
                        pltpu.VMEM((1, c), jnp.float32)],
        interpret=INTERPRET,
    )(ids2, y)
    if want_pe:
        return out[:n], pe[:n]
    return out[:n], None


# -- sum: self-adjoint, one custom VJP ------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=())
def fused_segment_sum(data, ids):
    """(N, C), sorted int32 ids -> per-row segment sums (N, C) f32."""
    out, _ = _fused_raw(data, ids, 'sum', False)
    return out


def _fss_fwd(data, ids):
    proto = jnp.zeros((0,), data.dtype)   # dtype token (pytree-safe)
    return fused_segment_sum(data, ids), (ids, proto)


def _fss_bwd(res, g):
    ids, proto = res
    out, _ = _fused_raw(g, ids, 'sum', False)
    return out.astype(proto.dtype), None


fused_segment_sum.defvjp(_fss_fwd, _fss_bwd)


# -- max: winner = lowest index achieving the max --------------------------
@partial(jax.custom_vjp, nondiff_argnums=())
def fused_segment_max(data, ids):
    """(N, C), sorted int32 ids -> per-row segment maxes (N, C) f32."""
    out, _ = _fused_raw(data, ids, 'max', False)
    return out


def _fsm_fwd(data, ids):
    total, pe = _fused_raw(data, ids, 'max', True)
    xf = data.astype(jnp.float32)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), ids[1:] != ids[:-1]])
    winner = (xf == total) & (first[:, None] | (xf > pe))
    return total, (winner, ids, jnp.zeros((0,), data.dtype))


def _fsm_bwd(res, g):
    winner, ids, proto = res
    gsum, _ = _fused_raw(g, ids, 'sum', False)
    return jnp.where(winner, gsum, 0.0).astype(proto.dtype), None


fused_segment_max.defvjp(_fsm_fwd, _fsm_bwd)


def _winner_mask(data, ids):
    """(N, C) bool — lowest row index achieving its segment's max
    (reference atomicMin traceback, scatter_points_cuda.cu:155-158)."""
    total, pe = _fused_raw(data, ids, 'max', True)
    xf = data.astype(jnp.float32)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), ids[1:] != ids[:-1]])
    return total, (xf == total) & (first[:, None] | (xf > pe))


# --------------------------------------------------------------------------
# Scatter-level wrappers: custom VJPs whose transposes are gathers /
# fused passes — never a row scatter (the serialized op on TPU).
# --------------------------------------------------------------------------
def _mapback_rows(table, ids, nrows):
    """take(table ++ [0-row], ids) — trash ids (== nrows) read zeros."""
    padded = jnp.concatenate([table, jnp.zeros_like(table[:1])], axis=0)
    return jnp.take(padded, jnp.minimum(ids, nrows), axis=0,
                    indices_are_sorted=True)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sorted_reduce(data, ids, last_pos, live, num_segments: int, op: str):
    """Per-segment reduce -> (num_segments, C); empty segments -> 0.

    Mirrors ``Scatter.reduce`` semantics (sum / max with the lowest-index
    max-gradient tie-break) for SORTED ids.  ``last_pos`` must be the
    monotone per-segment last sorted row (cummax-filled for empties);
    ``live`` the per-segment nonempty mask.
    """
    out, _ = _fused_raw(data, ids, op, False)
    out = jnp.take(out, last_pos, axis=0, indices_are_sorted=True)
    return jnp.where(live[:, None], out, 0.0)


def _sr_fwd(data, ids, last_pos, live, num_segments, op):
    if op == 'sum':
        fused, _ = _fused_raw(data, ids, 'sum', False)
        res = (None, ids, jnp.zeros((0,), data.dtype))
    else:
        fused, winner = _winner_mask(data, ids)
        res = (winner, ids, jnp.zeros((0,), data.dtype))
    out = jnp.take(fused, last_pos, axis=0, indices_are_sorted=True)
    return jnp.where(live[:, None], out, 0.0), res


def _sr_bwd(num_segments, op, res, g):
    winner, ids, proto = res
    g_pt = _mapback_rows(g, ids, num_segments)
    if op != 'sum':
        g_pt = jnp.where(winner, g_pt, 0.0)
    return g_pt.astype(proto.dtype), None, None, None


sorted_reduce.defvjp(_sr_fwd, _sr_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def sorted_reduce_mapback(data, ids, valid, op: str):
    """Fused ``mapback(reduce(data))`` -> (N, C); invalid rows -> 0."""
    out, _ = _fused_raw(data, ids, op, False)
    return jnp.where(valid[:, None], out, 0.0)


def _srm_fwd(data, ids, valid, op):
    if op == 'sum':
        fused, _ = _fused_raw(data, ids, 'sum', False)
        res = (None, ids, valid, jnp.zeros((0,), data.dtype))
    else:
        fused, winner = _winner_mask(data, ids)
        res = (winner, ids, valid, jnp.zeros((0,), data.dtype))
    return jnp.where(valid[:, None], fused, 0.0), res


def _srm_bwd(op, res, g):
    winner, ids, valid, proto = res
    gm = jnp.where(valid[:, None], g, 0.0)
    gsum, _ = _fused_raw(gm, ids, 'sum', False)
    if op != 'sum':
        gsum = jnp.where(winner, gsum, 0.0)
    return gsum.astype(proto.dtype), None, None


sorted_reduce_mapback.defvjp(_srm_fwd, _srm_bwd)
