"""Pallas TPU kernel: fused anchor-head Gaussian-distance loss (fwd + VJP).

The anchor head's decoded-box GD loss is pure elementwise math, but its XLA
form pays for layout, twice:

* forward: the conv output ``(B, H, W, A*7)`` must be de-interleaved into
  per-component planes; any plane whose minor dim is A (6) lane-pads to 128
  (~20x HBM), and the relayout reshapes dominated the loss-phase trace
  (26 of 32 ms at Waymo b2 before the ``(B, H, W*A)`` fold);
* backward: the 7 plane gradients must be re-interleaved into the conv
  channel layout for the conv backward — XLA emits per-component pad+add
  sweeps over the 128-lane-padded map (+16 ms at Waymo, +5 ms at KITTI).

This kernel removes both: it reads ``bbox_pred`` directly in the conv
layout bitcast to ``(M, A*7)`` rows (M = B*H*W), aligns components IN
REGISTERS with exact lane rolls (see ``_block_loss.parts``), runs the
repo's own ``decode_parts`` + ``gaussian.py`` loss math on ``(TM, A*7)``
lane groups, and reduces with a lane-0-of-each-group mask.  The backward
pass is
``jax.grad`` of the same block function traced INSIDE a second kernel, so
``d(bbox_pred)`` is written directly in the conv layout — no
re-interleave exists anywhere.

Semantics match ``GDAnchor3DHead.loss``'s decoded-box branch exactly
(``loss_decoded_bbox`` path): decode pred & target deltas against anchors
(``DeltaXYZWLHRBBoxCoder.decode_parts``), replace pred by target where
weight <= 0 (GDLoss's branch-free zero-weight rule), Gaussian distance
from ``BAG_GD_LOSS``, postprocess fun/tau, then
``sum(loss * weight) * loss_weight * decode_weight / avg_factor``
(``weight_reduce_loss`` with reduction='mean').  Reference chain:
``gd_anchor3d_head.py:128-141`` + ``gaussian_distance_loss.py:251-310``.

VERDICT (measured, round 3 — honest chained-readback clock): the kernel
LOSES end-to-end at both scales and is gated OFF by default.  After the
``(B, H, W*A)`` plane fold landed, the XLA loss path has no relayout left
to remove, and the kernel's backward (a full fwd+bwd re-trace of the
block function, with 7 lane-rolls each way) costs more than it saves:

    KITTI b4 f32 dyn:        kernel 43.4 ms/step vs XLA 38.5 ms
    Waymo b2 bf16 hard:      kernel 96.1 ms/step vs XLA 89.5 ms
                             (loss phase ~16.5 ms either way; the kernel
                             adds ~6 ms to bwd_opt)

Kept (with interpreter parity tests, ``tests/test_gd_loss_kernel.py``)
as the measured negative result: set ``MMDET3D_TPU_GD_KERNEL=pallas`` to
re-run the experiment.  Same e2e discipline as the rejected BEV splat
kernel (see PARITY.md "Pallas verdicts").
"""
from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.bbox.coders import DeltaXYZWLHRBBoxCoder
from ...models.losses.gaussian import BAG_GD_LOSS, gaussian_params

_HI = jax.lax.Precision.HIGHEST

# Set by tests to run the kernels through the Pallas interpreter on CPU.
INTERPRET = False

# Dispatch: 'xla' (default) = the plane path — the kernel measured SLOWER
# e2e at both bench scales (see module docstring); 'pallas' forces the
# kernel (experiments + interpreter parity tests).
IMPL = os.environ.get('MMDET3D_TPU_GD_KERNEL', 'xla')


def enabled(hw: int, a: int, gd, m: int = None) -> bool:
    """Should the head's decoded-box branch use this kernel?

    ``m`` (= B*H*W, the packed row count) must be passed when known: the
    packing factor chosen by :func:`_prep` additionally requires
    ``(m // p) % 8 == 0``, so a shape accepted on ``hw`` alone could still
    reach ``_tile_rows() == 0`` inside ``_prep``.
    """
    if IMPL != 'pallas':
        return False
    return (hasattr(gd, 'loss_type') and not gd.kwargs
            and gd.reduction == 'mean' and supported(hw, a, m))


def _w_bcast(na: int) -> np.ndarray:
    """(NA, NA*7) one-hot: broadcasts each anchor's weight to its 7-lane
    group (NA = anchors per packed row)."""
    out = np.zeros((na, na * 7), np.float32)
    for i in range(na * 7):
        out[i // 7, i] = 1.0
    return out


def _block_loss(pred, tgt, w_a, anc, wb, *, loss_type: str,
                center_offset, fun: str, tau: float, alpha: float):
    """Scalar GD loss sum over one (TM, P*A*7) block.

    Rows hold P packed anchor groups (P = 128 // (A*7), so ~all lanes are
    useful); w_a: (TM, P*A) weights; wb: (P*A, P*A*7) one-hot broadcast.
    """
    def parts(x):
        # Lane rolls instead of one-hot matmuls: parts_k[lane a*7] =
        # x[lane a*7 + k] — exact moves, VPU-cheap (the (TM,42)x(42,42)
        # HIGHEST dots measured 7.4 ms fwd at KITTI scale; rolls ~2.5x
        # faster).  Lanes not == 0 (mod 7) mix components across anchor
        # groups, but only lane 0 of each group survives the final mask
        # and all junk-lane values stay finite (deltas are bounded and
        # gaussian_params clips dims), so no NaN can leak through the
        # masked select or its gradient.
        return tuple(x if k == 0 else jnp.roll(x, -k, axis=1)
                     for k in range(7))

    pw, tw, aw = parts(pred), parts(tgt), parts(anc)
    w = jax.lax.dot_general(w_a, wb, (((1,), (0,)), ((), ())),
                            precision=_HI,
                            preferred_element_type=jnp.float32)
    coder = DeltaXYZWLHRBBoxCoder()
    dec_p = coder.decode_parts(aw, pw)
    dec_t = coder.decode_parts(aw, tw)
    valid = w > 0
    dec_p = tuple(jnp.where(valid, p, t) for p, t in zip(dec_p, dec_t))
    gp = gaussian_params(dec_p, center_offset)
    gt = gaussian_params(dec_t, center_offset)
    loss = BAG_GD_LOSS[loss_type](gp, gt, fun=fun, tau=tau, alpha=alpha)
    k7 = pred.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k7), 1)
    mask = (lane % 7 == 0).astype(jnp.float32)
    return jnp.sum(loss * w * mask)


def _fwd_kernel(pred_ref, tgt_ref, w_ref, anc_ref, wb_ref,
                out_ref, **cfg):
    s = _block_loss(pred_ref[...].astype(jnp.float32),
                    tgt_ref[...], w_ref[...], anc_ref[...],
                    wb_ref[...], **cfg)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += s


def _bwd_kernel(g_ref, pred_ref, tgt_ref, w_ref, anc_ref, wb_ref,
                dpred_ref, **cfg):
    pred = pred_ref[...].astype(jnp.float32)
    grad = jax.grad(lambda p: _block_loss(
        p, tgt_ref[...], w_ref[...], anc_ref[...],
        wb_ref[...], **cfg))(pred)
    dpred_ref[...] = (grad * g_ref[0]).astype(dpred_ref.dtype)


def _pack(k7: int) -> int:
    """Anchor groups per 128-lane row.  Pallas operands are compact
    row-major in HBM, so (M, K7) -> (M//P, P*K7) is a free bitcast."""
    return max(1, 128 // k7)


def _tile_rows(hw: int, lo: int = 64, hi: int = 512) -> int:
    """Largest divisor of hw in [lo, hi] that is a multiple of 8.

    hi is a VMEM budget: the block function keeps ~60 live (TM, 128-lane)
    f32 arrays (3 inputs x 7 component broadcasts + Gaussian params +
    loss intermediates); TM = 1728 hit Mosaic's 16 MB scoped-vmem limit
    at 45.9 MB, TM <= 512 fits."""
    best = 0
    for t in range(lo, hi + 1, 8):
        if hw % t == 0:
            best = t
    return best


def supported(hw: int, a: int, m: int = None) -> bool:
    """Mirror _prep's packing choice exactly (incl. the (m//p)%8 clause
    when m is known) so an accepted shape can never hit _tile_rows()==0
    inside _prep."""
    k7 = a * 7
    p = _pack(k7)
    while p > 1 and (hw % p or (m is not None and (m // p) % 8)):
        p -= 1
    if m is not None and (m // p) % 8:
        return False
    return k7 <= 512 and _tile_rows(hw // p) > 0


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def anchor_gd_loss_pallas(pred2, tgt2, w_a, anc2, hw: int, cfg: Tuple):
    """Fused decoded-box GD loss over interleaved anchor rows.

    Args:
        pred2: (M, A*7) bbox_pred bitcast rows (M = B*H*W), f32 or bf16.
        tgt2: (M, A*7) encoded target deltas, f32.
        w_a: (M, A) per-anchor weights (already scaled by decode_weight).
        anc2: (HW, A*7) anchor rows (numpy-derived constant), f32.
        hw: static H*W (anchor rows repeat per sample).
        cfg: hashable ((loss_type, center_offset, fun, tau, alpha)).
    Returns the SUM of weighted losses (divide by avg_factor outside).
    """
    return _fwd(pred2, tgt2, w_a, anc2, hw, cfg)


def _cfg_dict(cfg):
    loss_type, center_offset, fun, tau, alpha = cfg
    return dict(loss_type=loss_type, center_offset=center_offset,
                fun=fun, tau=tau, alpha=alpha)


def _specs(tm, row_lanes, na, hw_rows):
    blocks_per_sample = hw_rows // tm
    return [
        pl.BlockSpec((tm, row_lanes), lambda g: (g, 0)),
        pl.BlockSpec((tm, row_lanes), lambda g: (g, 0)),
        pl.BlockSpec((tm, na), lambda g: (g, 0)),
        pl.BlockSpec((tm, row_lanes),
                     lambda g, bps=blocks_per_sample: (g % bps, 0)),
        pl.BlockSpec((na, row_lanes), lambda g: (0, 0)),
    ]


def _prep(pred2, tgt2, w_a, anc2, hw):
    """Pack P anchor groups per row (free bitcasts) and pick the tile."""
    m, k7 = pred2.shape
    a = k7 // 7
    p = _pack(k7)
    while p > 1 and (hw % p or (m // p) % 8):
        p -= 1
    row_lanes, na = p * k7, p * a
    hw_rows = hw // p
    mr = m // p
    return (pred2.reshape(mr, row_lanes), tgt2.reshape(mr, row_lanes),
            w_a.reshape(mr, na), anc2.reshape(hw_rows, row_lanes),
            jnp.asarray(_w_bcast(na)), mr, row_lanes, na, hw_rows)


def _fwd(pred2, tgt2, w_a, anc2, hw, cfg):
    (pred2, tgt2, w_a, anc2, wb, mr, row_lanes, na,
     hw_rows) = _prep(pred2, tgt2, w_a, anc2, hw)
    tm = _tile_rows(hw_rows)
    ng = mr // tm
    out = pl.pallas_call(
        partial(_fwd_kernel, **_cfg_dict(cfg)),
        grid=(ng,),
        in_specs=_specs(tm, row_lanes, na, hw_rows),
        out_specs=pl.BlockSpec((1, 1), lambda g: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=INTERPRET,
    )(pred2, tgt2, w_a, anc2, wb)
    return out[0, 0]


def _fwd_rule(pred2, tgt2, w_a, anc2, hw, cfg):
    return _fwd(pred2, tgt2, w_a, anc2, hw, cfg), (pred2, tgt2, w_a, anc2)


def _bwd_rule(hw, cfg, res, g):
    pred2, tgt2, w_a, anc2 = res
    m, k7 = pred2.shape
    (pred2p, tgt2p, w_ap, anc2p, wb, mr, row_lanes, na,
     hw_rows) = _prep(pred2, tgt2, w_a, anc2, hw)
    tm = _tile_rows(hw_rows)
    ng = mr // tm
    gvec = jnp.full((1,), g, jnp.float32)
    dpred = pl.pallas_call(
        partial(_bwd_kernel, **_cfg_dict(cfg)),
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _specs(tm, row_lanes, na, hw_rows),
        out_specs=pl.BlockSpec((tm, row_lanes), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((mr, row_lanes), pred2.dtype),
        interpret=INTERPRET,
    )(gvec, pred2p, tgt2p, w_ap, anc2p, wb)
    return dpred.reshape(m, k7), None, None, None


anchor_gd_loss_pallas.defvjp(_fwd_rule, _bwd_rule)
