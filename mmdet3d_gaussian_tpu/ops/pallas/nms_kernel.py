"""Pallas TPU kernel: greedy NMS suppression sweep.

The XLA sweep (``ops/nms.py::_suppress_sweep``) is a ``fori_loop`` whose K
iterations each launch device work — K sequential dispatches of tiny vector
ops dominate NMS latency.  Here the whole sweep runs INSIDE one kernel: the
(K, K) IoU matrix sits in VMEM and the K-step recurrence is an on-chip loop
(nanoseconds per step), turning milliseconds of launch latency into
microseconds of VPU work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_sweep_kernel(thr_ref, iou_ref, valid_ref, keep_ref):
    """iou (K, K) f32; valid (1, K) f32; keep (1, K) f32 output."""
    k = iou_ref.shape[0]
    thr = thr_ref[0]
    keep_ref[0, :] = valid_ref[0, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        # dynamic lane reads from VMEM are not Mosaic-legal; extract
        # keep[i] with a masked reduction instead
        keep_i = jnp.sum(jnp.where(col[0] == i, keep_ref[0, :], 0.0))
        row = iou_ref[pl.ds(i, 1), :]                  # (1, K)
        kill = ((row[0] > thr) & (col[0] > i)).astype(jnp.float32) * keep_i
        keep_ref[0, :] = keep_ref[0, :] * (1.0 - kill)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def nms_sweep_pallas(iou, valid, thr: float):
    """Greedy score-order suppression: returns keep mask (K,) bool.

    iou: (K, K) pairwise matrix, rows/cols in descending score order.
    """
    k = iou.shape[0]
    keep = pl.pallas_call(
        _nms_sweep_kernel,
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray([thr], jnp.float32), iou.astype(jnp.float32),
      valid.astype(jnp.float32).reshape(1, k))
    return keep[0] > 0.5
