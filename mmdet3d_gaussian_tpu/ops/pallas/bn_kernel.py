"""Pallas TPU kernel: one-pass BatchNorm statistics (fwd + bwd).

The per-op trace attributes ~5.7 ms/step at KITTI b4 (and ~18 ms at Waymo
b2) to ``multiply_reduce`` fusions — the BN statistics reductions over the
BEV canvas, 49 per step.  XLA executes each (B*H*W, C) -> (C,) reduction
at ~78 GB/s, ~10x off the v5e HBM roofline (measured: 0.3-0.7 ms for a
55 MB input).  The reference counterpart is cuDNN's fused BN
(``torch.nn.BatchNorm2d`` under ``norm_cfg`` — SURVEY §2.4).

One Pallas kernel computes BOTH moments (sum, sum of squares) in a single
read of the activation, accumulating f32 in VMEM scratch across the
sequential grid; the backward twin reads (g, x) once and emits the two
reductions the BN gradient needs (sum g, sum g*xhat).  Everything
elementwise stays in XLA where it fuses into neighbors.

``FastBatchNorm`` is a drop-in for ``flax.linen.BatchNorm`` as used by
``ConvBNReLU``/``SECONDFPN`` (same param collection: params.scale/bias,
batch_stats.mean/var; same eps/momentum semantics), with an ``axis_name``
for the SyncBN analogue (psum of the tiny (C,) moments, as the reference
Waymo configs' ``SyncBN`` — ``hv_pointpillars_secfpn_waymo.py:3``).

VERDICT (measured, round 3 — per-op trace + honest clock): the kernel
itself hits the roofline (32 calls = 2.7 ms vs 5.7 ms of XLA reduction
fusions at KITTI b4) but is gated OFF by default because the LAYOUT TAX
around it is 3x the saving: conv activations live in XLA's batch-minor
``{3,0,2,1:T(4,128)}`` layout, and routing them through any Pallas call
forces a row-major relayout (+4 ms of copies) plus row padding
(+5.2 ms of ``pad`` ops) — step 37.6 -> 51.4 ms/step e2e.  Pallas TPU
exposes no way to accept a custom tiled layout, so the fix must come
from upstream.  Kept (with parity tests) as the measured negative
result; MMDET3D_TPU_BN_KERNEL=pallas re-runs the experiment.  The XLA
fallback branch is numerically identical to flax BatchNorm, so the
model-side swap to FastBatchNorm is behavior-preserving.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False
# Default 'xla': the Pallas moments kernel LOSES e2e to the layout tax
# around it (see module docstring).  'pallas' re-runs the experiment.
IMPL = os.environ.get('MMDET3D_TPU_BN_KERNEL', 'xla')

_TM = 1024


def enabled() -> bool:
    if IMPL == 'pallas' or INTERPRET:
        return True
    return False


def _moments_kernel(x_ref, su_ref, sq_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)
    acc_ref[0:1] += jnp.sum(x, axis=0, keepdims=True)
    acc_ref[1:2] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        su_ref[...] = acc_ref[0:1]
        sq_ref[...] = acc_ref[1:2]


def _bwd_kernel(g_ref, x_ref, mean_ref, inv_ref, sg_ref, sgx_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = g_ref[...].astype(jnp.float32)
    xhat = (x_ref[...].astype(jnp.float32) - mean_ref[...]) * inv_ref[...]
    acc_ref[0:1] += jnp.sum(g, axis=0, keepdims=True)
    acc_ref[1:2] += jnp.sum(g * xhat, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        sg_ref[...] = acc_ref[0:1]
        sgx_ref[...] = acc_ref[1:2]


def _pad_rows(x, tm):
    m = x.shape[0]
    npad = (-m) % tm
    if npad:
        x = jnp.concatenate(
            [x, jnp.zeros((npad, x.shape[1]), x.dtype)], axis=0)
    return x


def moments(x2):
    """(M, C) -> (sum, sum_sq), each (C,) f32, in one HBM pass."""
    x2 = _pad_rows(x2, _TM)
    m, c = x2.shape
    ng = m // _TM
    su, sq = pl.pallas_call(
        _moments_kernel,
        grid=(ng,),
        in_specs=[pl.BlockSpec((_TM, c), lambda g: (g, 0))],
        out_specs=[pl.BlockSpec((1, c), lambda g: (0, 0)),
                   pl.BlockSpec((1, c), lambda g: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=INTERPRET,
    )(x2)
    return su[0], sq[0]


def grad_moments(g2, x2, mean, inv):
    """(sum g, sum g*xhat), each (C,) f32, one pass over (g, x)."""
    g2 = _pad_rows(g2, _TM)
    x2 = _pad_rows(x2, _TM)   # pad rows give xhat = -mean*inv, but g = 0
    m, c = g2.shape
    ng = m // _TM
    sg, sgx = pl.pallas_call(
        _bwd_kernel,
        grid=(ng,),
        in_specs=[pl.BlockSpec((_TM, c), lambda g: (g, 0)),
                  pl.BlockSpec((_TM, c), lambda g: (g, 0)),
                  pl.BlockSpec((1, c), lambda g: (0, 0)),
                  pl.BlockSpec((1, c), lambda g: (0, 0))],
        out_specs=[pl.BlockSpec((1, c), lambda g: (0, 0)),
                   pl.BlockSpec((1, c), lambda g: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=INTERPRET,
    )(g2, x2, mean[None], inv[None])
    return sg[0], sgx[0]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train(x2, scale, bias, eps: float, axis_name: Optional[str]):
    """Training-mode BN over (M, C) rows; returns (y, mean, var)."""
    su, sq = moments(x2)
    cnt = jnp.asarray(x2.shape[0], jnp.float32)
    if axis_name is not None:
        su = jax.lax.psum(su, axis_name)
        sq = jax.lax.psum(sq, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
    mean = su / cnt
    var = jnp.maximum(sq / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = ((x2.astype(jnp.float32) - mean) * (inv * scale)
         + bias).astype(x2.dtype)
    return y, mean, var


def _bn_fwd(x2, scale, bias, eps, axis_name):
    y, mean, var = bn_train(x2, scale, bias, eps, axis_name)
    inv = jax.lax.rsqrt(var + eps)
    cnt = jnp.asarray(x2.shape[0], jnp.float32)
    return (y, mean, var), (x2, scale, mean, inv, cnt)


def _bn_bwd(eps, axis_name, res, cts):
    gy, _gmean, _gvar = cts   # mean/var outputs feed running stats: no grad
    x2, scale, mean, inv, cnt = res
    gyf = gy.astype(jnp.float32)
    sg, sgx = grad_moments(gyf, x2, mean, inv)
    if axis_name is not None:
        sg = jax.lax.psum(sg, axis_name)
        sgx = jax.lax.psum(sgx, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
    # d scale / d bias
    dscale = sgx
    dbias = sg
    # dx = inv*scale * (g - sg/M - xhat * sgx/M)
    xhat = (x2.astype(jnp.float32) - mean) * inv
    dx = (inv * scale) * (gyf - sg / cnt - xhat * (sgx / cnt))
    return dx.astype(x2.dtype), dscale, dbias


bn_train.defvjp(_bn_fwd, _bn_bwd)


class FastBatchNorm(nn.Module):
    """flax.linen.BatchNorm drop-in with Pallas one-pass statistics.

    Same variables as ``nn.BatchNorm`` (params.scale/bias,
    batch_stats.mean/var), torch-compatible eps/momentum defaults as used
    throughout the repo (eps 1e-3, momentum 0.99 == torch 0.01).
    """
    use_running_average: Optional[bool] = None
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[str] = None
    axis_name: Optional[str] = None
    # channel_fold=F: the input's channel axis carries F copies of the
    # SAME logical channels (e.g. the W-folded stage-1 layout in
    # models/backbones.py, where channel q*C+c is logical channel c at
    # W-parity q).  Parameters/running stats keep shape (C,) and batch
    # statistics merge the F groups — numerically identical to unfolded
    # BN over the same elements.
    channel_fold: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param('use_running_average',
                                self.use_running_average,
                                use_running_average)
        fold = self.channel_fold
        if fold > 1:
            return self._folded(x, use_ra, fold)
        c = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)

        if use_ra or not enabled():
            # eval mode, or XLA fallback (CPU tests): same formulas,
            # XLA reductions
            xf = x.astype(jnp.float32)
            if use_ra:
                mean, var = ra_mean.value, ra_var.value
            else:
                x2 = xf.reshape(-1, c)
                su = jnp.sum(x2, axis=0)
                sq = jnp.sum(x2 * x2, axis=0)
                cnt = jnp.asarray(x2.shape[0], jnp.float32)
                if self.axis_name is not None:
                    su = jax.lax.psum(su, self.axis_name)
                    sq = jax.lax.psum(sq, self.axis_name)
                    cnt = jax.lax.psum(cnt, self.axis_name)
                mean = su / cnt
                var = jnp.maximum(sq / cnt - mean * mean, 0.0)
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            y = ((xf - mean) * inv + bias).astype(x.dtype)
            if not use_ra and not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
            return y

        shp = x.shape
        y2, mean, var = bn_train(x.reshape(-1, c), scale, bias,
                                 self.epsilon, self.axis_name)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var)
        return y2.reshape(shp)

    def _folded(self, x, use_ra, fold: int):
        """channel_fold > 1: stats merged across the F channel groups;
        normalization applied on the folded tensor (no relayout)."""
        c = x.shape[-1] // fold
        assert x.shape[-1] == c * fold, (x.shape, fold)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            x2 = xf.reshape(-1, c * fold)
            su = jnp.sum(x2, axis=0).reshape(fold, c).sum(0)
            sq = (jnp.sum(x2 * x2, axis=0).reshape(fold, c).sum(0))
            cnt = jnp.asarray(x2.shape[0] * fold, jnp.float32)
            if self.axis_name is not None:
                su = jax.lax.psum(su, self.axis_name)
                sq = jax.lax.psum(sq, self.axis_name)
                cnt = jax.lax.psum(cnt, self.axis_name)
            mean = su / cnt
            var = jnp.maximum(sq / cnt - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        invf = jnp.tile(inv, fold)
        y = ((xf - jnp.tile(mean, fold)) * invf
             + jnp.tile(bias, fold)).astype(x.dtype)
        if not use_ra and not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var)
        return y
