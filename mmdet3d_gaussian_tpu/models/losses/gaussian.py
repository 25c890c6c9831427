"""Gaussian-distribution-distance regression losses — the heart of the framework.

Re-derivation of the reference's closed-form losses
(``/root/reference/mmdet3d_gaussian/models/losses/gaussian_distance_loss.py``)
in a TPU-idiomatic form: a 3D box ``(x, y, z, dx, dy, dz, yaw)`` is modeled as
an anisotropic Gaussian with mean ``xyz + center_offset * dims`` and
block-diagonal covariance

    Sigma = [[Sigma_bev, 0], [0, sl^2]],   Sigma_bev = R diag(a^2, b^2) R^T

with ``a = dx/2, b = dy/2, sl = dz/2`` (no pitch/roll — the same structure the
reference docstring derives at ``gaussian_distance_loss.py:44-75``).

Instead of materializing 2x2 matrices and bmm chains (the reference CUDA-era
formulation), every distance below is expanded to scalar component arithmetic:
pure element-wise VPU work, fully fused by XLA, with arbitrary leading batch
dims.  For a symmetric 2x2 ``S = [[s00, s01], [s01, s11]]``:

    tr(S1 @ S2)       = s1_00*s2_00 + 2*s1_01*s2_01 + s1_11*s2_11
    v^T S v           = s00*vx^2 + 2*s01*vx*vy + s11*vy^2
    det(S)            = s00*s11 - s01^2
    R diag(p,q) R^T   = [[p c^2 + q s^2, (p-q) c s], [(p-q) c s, p s^2 + q c^2]]

Loss bag parity (reference ``BAG_GD_LOSS``, ``gaussian_distance_loss.py:253-259``):
gwd3d, kld3d, jd3d, kld3d_symmax, kld3d_symmin, bd3d, kfiou3d.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax.numpy as jnp

from ...registry import LOSSES

_EPS_DIM = 1e-7
_DIM_MAX = 1e7
# sqrt'(0) = inf: clip the radicand to a tiny positive floor so rows at the
# zero-distance boundary (e.g. padded rows whose pred was replaced by the
# target) get a FINITE gradient that the zero weight can kill (0 * finite
# = 0, while 0 * inf = NaN — this NaN'd training around step 50).
_SQRT_FLOOR = 1e-9


def _safe_sqrt(x):
    return jnp.sqrt(jnp.clip(x, _SQRT_FLOOR))


def gaussian_params(boxes, center_offset: Sequence[float] = (0., 0., 0.5)):
    """Box ``(..., 7)`` array OR length-7 component sequence -> Gaussian
    components.

    Mirrors ``preprocess`` (reference ``gaussian_distance_loss.py:8-21``):
    dims are clamped to [1e-7, 1e7] *before* halving; the mean is
    ``xyz + center_offset * dims`` (default lifts bottom-center z to the
    gravity center).

    The component-sequence form ``(x, y, z, w, l, h, yaw)`` keeps every
    quantity a same-shape plane so the whole distance stays elementwise and
    XLA-fusible (no ``(N, 7)`` minor-dim-7 layouts — those pad 7 lanes to
    128 on TPU).

    Returns dict with: ``x, y, z, cos, sin, a, b, sl`` where (a, b) are
    the BEV semi-axes and sl the vertical semi-axis.
    """
    if isinstance(boxes, (tuple, list)):
        x, y, z, w, l, h, yaw = boxes
    else:
        x, y, z = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        w, l, h = boxes[..., 3], boxes[..., 4], boxes[..., 5]
        yaw = boxes[..., 6]
    off = center_offset
    w_c = jnp.clip(w, _EPS_DIM, _DIM_MAX)
    l_c = jnp.clip(l, _EPS_DIM, _DIM_MAX)
    h_c = jnp.clip(h, _EPS_DIM, _DIM_MAX)
    return dict(
        x=x + off[0] * w,
        y=y + off[1] * l,
        z=z + off[2] * h,
        cos=jnp.cos(yaw),
        sin=jnp.sin(yaw),
        a=0.5 * w_c,
        b=0.5 * l_c,
        sl=0.5 * h_c,
    )


def _sigma_bev(g):
    """Components of Sigma_bev = R diag(a^2,b^2) R^T: (s00, s01, s11)."""
    c, s, a2, b2 = g['cos'], g['sin'], g['a'] ** 2, g['b'] ** 2
    s00 = a2 * c * c + b2 * s * s
    s11 = a2 * s * s + b2 * c * c
    s01 = (a2 - b2) * c * s
    return s00, s01, s11


def _sigma_bev_inv(g):
    """Components of Sigma_bev^{-1} = R diag(1/a^2,1/b^2) R^T."""
    c, s = g['cos'], g['sin']
    ia2, ib2 = 1.0 / g['a'] ** 2, 1.0 / g['b'] ** 2
    i00 = ia2 * c * c + ib2 * s * s
    i11 = ia2 * s * s + ib2 * c * c
    i01 = (ia2 - ib2) * c * s
    return i00, i01, i11


def postprocess(distance, fun: str = 'log1p', tau: float = 1.0):
    """Nonlinearity + tau saturation (reference ``:24-39``)."""
    if fun == 'log1p':
        distance = jnp.log1p(distance)
    elif fun == 'expm1':
        distance = jnp.expm1(distance)
    elif fun == 'nlog':
        distance = -jnp.log(1.0 - distance + 1e-7)
    elif fun == 'none':
        pass
    else:
        raise ValueError(f'Invalid non-linear function {fun}')
    if tau >= 1.0:
        return 1.0 - tau / (tau + distance)
    return distance


def gwd3d(gp, gt, fun='log1p', tau=1.0, alpha=1.0, normalize=True):
    """3D Gaussian-Wasserstein distance (reference ``:42-106``).

    gwd^2 = ||mu_p - mu_t||^2
          + alpha^2 * [ tr(Sp) + tr(St) - 2 tr((Sp^1/2 St Sp^1/2)^1/2) ]
    with the BEV trace-root expanded via
    tr(...) = sqrt(tr(Sp St) + 2 sqrt(det Sp det St)) and the z-block
    contributing (sl_p - sl_t)^2.
    """
    xyz_d = ((gp['x'] - gt['x']) ** 2 + (gp['y'] - gt['y']) ** 2
             + (gp['z'] - gt['z']) ** 2)

    p00, p01, p11 = _sigma_bev(gp)
    t00, t01, t11 = _sigma_bev(gt)
    tr_pt = p00 * t00 + 2 * p01 * t01 + p11 * t11
    det_sqrt = gp['a'] * gp['b'] * gt['a'] * gt['b']

    whlr = (gp['a'] ** 2 + gp['b'] ** 2 + gt['a'] ** 2 + gt['b'] ** 2
            - 2 * _safe_sqrt(tr_pt + 2 * det_sqrt)
            + (gp['sl'] - gt['sl']) ** 2)

    distance = _safe_sqrt(xyz_d + alpha * alpha * whlr)

    if normalize:
        # scale = 2 * (det Sigma_p det Sigma_t)^(1/12) — geometric-mean size
        # (reference :101-104).
        logsum = jnp.log(det_sqrt) + jnp.log(gp['sl']) + jnp.log(gt['sl'])
        distance = distance / (2 * jnp.exp(logsum / 6.0))

    return postprocess(distance, fun, tau)


def kld3d(gp, gt, fun='log1p', tau=1.0, alpha=1.0, sqrt=True):
    """KL(P || T)-style divergence, pred covariance inverted (ref ``:109-141``).

    Note the reference's exact term layout is preserved (including the
    ``(log det Sp^1/2 - log det St^1/2)`` sign — it computes KL with the roles
    giving an analytic inverse on the *pred* side).
    """
    i00, i01, i11 = _sigma_bev_inv(gp)
    t00, t01, t11 = _sigma_bev(gt)

    dx = gp['x'] - gt['x']
    dy = gp['y'] - gt['y']
    dz = gp['z'] - gt['z']
    isl2_p = 1.0 / gp['sl'] ** 2

    xyz_d = 0.5 * (i00 * dx * dx + 2 * i01 * dx * dy + i11 * dy * dy)
    xyz_d = xyz_d + 0.5 * dz * dz * isl2_p

    whlr = 0.5 * (i00 * t00 + 2 * i01 * t01 + i11 * t11)
    whlr = whlr + 0.5 * isl2_p * gt['sl'] ** 2
    log_det_p_sqrt = jnp.log(gp['a']) + jnp.log(gp['b']) + jnp.log(gp['sl'])
    log_det_t_sqrt = jnp.log(gt['a']) + jnp.log(gt['b']) + jnp.log(gt['sl'])
    whlr = whlr + (log_det_p_sqrt - log_det_t_sqrt) - 1.5

    distance = xyz_d / (alpha * alpha) + whlr
    if sqrt:
        distance = _safe_sqrt(distance)
    return postprocess(distance, fun, tau)


def bd3d(gp, gt, fun='log1p', tau=1.0, alpha=1.0, sqrt=True):
    """Bhattacharyya distance (reference ``:144-186``)."""
    p00, p01, p11 = _sigma_bev(gp)
    t00, t01, t11 = _sigma_bev(gt)
    m00, m01, m11 = 0.5 * (p00 + t00), 0.5 * (p01 + t01), 0.5 * (p11 + t11)
    ml = 0.5 * (gp['sl'] ** 2 + gt['sl'] ** 2)

    det = jnp.clip(m00 * m11 - m01 * m01, 1e-7)
    inv_det = 1.0 / det
    dx = gp['x'] - gt['x']
    dy = gp['y'] - gt['y']
    dz = gp['z'] - gt['z']
    # v^T M^{-1} v with M^{-1} = adj(M)/det.
    quad = (m11 * dx * dx - 2 * m01 * dx * dy + m00 * dy * dy) * inv_det

    xyz_d = 0.125 * quad + 0.125 * dz * dz / ml

    whlr = 0.5 * (jnp.log(det) + jnp.log(ml))
    whlr = whlr - 0.25 * (jnp.log(gp['a'] ** 2) + jnp.log(gp['b'] ** 2)
                          + jnp.log(gp['sl'] ** 2))
    whlr = whlr - 0.25 * (jnp.log(gt['a'] ** 2) + jnp.log(gt['b'] ** 2)
                          + jnp.log(gt['sl'] ** 2))

    distance = xyz_d / (alpha * alpha) + whlr
    if sqrt:
        distance = _safe_sqrt(distance)
    return postprocess(distance, fun, tau)


def jd3d(gp, gt, fun='log1p', tau=1.0, alpha=1.0, sqrt=True):
    """Jeffreys = 0.5*(KL(p,t) + KL(t,p)) (reference ``:189-198``)."""
    jd = 0.5 * (kld3d(gp, gt, fun='none', tau=0., alpha=alpha, sqrt=False)
                + kld3d(gt, gp, fun='none', tau=0., alpha=alpha, sqrt=False))
    if sqrt:
        jd = _safe_sqrt(jd)
    return postprocess(jd, fun, tau)


def kld3d_symmax(gp, gt, fun='log1p', tau=1.0, alpha=1.0, sqrt=True):
    """max of both KL directions (reference ``:201-211``)."""
    kl_pt = kld3d(gp, gt, fun='none', tau=0., alpha=alpha, sqrt=sqrt)
    kl_tp = kld3d(gt, gp, fun='none', tau=0., alpha=alpha, sqrt=sqrt)
    return postprocess(jnp.maximum(kl_pt, kl_tp), fun, tau)


def kld3d_symmin(gp, gt, fun='log1p', tau=1.0, alpha=1.0, sqrt=True):
    """min of both KL directions (reference ``:214-224``)."""
    kl_pt = kld3d(gp, gt, fun='none', tau=0., alpha=alpha, sqrt=sqrt)
    kl_tp = kld3d(gt, gp, fun='none', tau=0., alpha=alpha, sqrt=sqrt)
    return postprocess(jnp.minimum(kl_pt, kl_tp), fun, tau)


def kfiou3d(gp, gt, fun='expm1', tau=0.0, alpha=1.0, sqrt=False):
    """Kalman-filter IoU loss (reference ``:227-248``).

    kf_inter = vol_p * vol_t / sqrt(det(Sigma_p + Sigma_t));
    loss = postprocess(1 - 4.6568...*kfiou, fun, tau=0).
    """
    del alpha, sqrt  # signature parity; unused by the reference too
    p00, p01, p11 = _sigma_bev(gp)
    t00, t01, t11 = _sigma_bev(gt)
    s00, s01, s11 = p00 + t00, p01 + t01, p11 + t11
    det = (s00 * s11 - s01 * s01) * (gp['sl'] ** 2 + gt['sl'] ** 2)

    vol_p = gp['a'] * gp['b'] * gp['sl']
    vol_t = gt['a'] * gt['b'] * gt['sl']
    inter = vol_p * vol_t / jnp.sqrt(jnp.clip(det, 1e-7))
    union = jnp.clip(vol_p + vol_t - inter, 1e-7)
    kfiou = inter / union
    return postprocess(1.0 - 4.656854249492381 * kfiou, fun, 0.0)


BAG_GD_LOSS = {
    'gwd3d': gwd3d,
    'kld3d': kld3d,
    'jd3d': jd3d,
    'kld3d_symmax': kld3d_symmax,
    'kld3d_symmin': kld3d_symmin,
    'bd3d': bd3d,
    'kfiou3d': kfiou3d,
}


def weight_reduce_loss(loss, weight=None, reduction='mean', avg_factor=None):
    """mmdet ``weight_reduce_loss`` semantics, jit-safe."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if reduction == 'mean':
            return jnp.mean(loss)
        if reduction == 'sum':
            return jnp.sum(loss)
        return loss
    if reduction == 'mean':
        return jnp.sum(loss) / avg_factor
    if reduction == 'none':
        return loss
    raise ValueError('avg_factor can not be used with reduction="sum"')


@LOSSES.register_module()
class GDLoss:
    """Gaussian-distance loss module (reference ``GDLoss``, ``:251-310``).

    jit-safe reformulation of the reference's semantics:

    * ``weight`` shaped like ``pred`` is collapsed by ``mean(-1)``
      (reference ``:295-296``).
    * Instead of the data-dependent zero-weight short-circuit
      (reference ``:290-292``), entries with ``weight <= 0`` have their pred
      replaced by the target before the distance is computed, so invalid /
      padded rows can never produce NaNs or spurious gradients; the final
      weighting then zeroes them exactly.  This is branch-free and composes
      with ``jax.grad`` under ``jit``.
    """

    def __init__(self, loss_type: str, center_offset=(0., 0., 0.5),
                 fun: str = 'log1p', tau: float = 1.0, alpha: float = 1.0,
                 reduction: str = 'mean', loss_weight: float = 1.0, **kwargs):
        assert reduction in ('none', 'sum', 'mean')
        assert loss_type in BAG_GD_LOSS
        if loss_type != 'kfiou3d':
            assert fun in ('log1p', 'none')
        else:
            assert fun in ('nlog', 'expm1', 'none')
        self.loss_fn = BAG_GD_LOSS[loss_type]
        self.loss_type = loss_type
        self.center_offset = tuple(center_offset)
        self.fun = fun
        self.tau = tau
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.kwargs = kwargs

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override: Optional[str] = None, **kwargs):
        assert reduction_override in (None, 'none', 'mean', 'sum')
        reduction = reduction_override or self.reduction
        fkwargs = dict(self.kwargs)
        fkwargs.update(kwargs)

        if isinstance(pred, (tuple, list)):
            # Component-plane form: pred/target are length-7 sequences of
            # same-shape arrays, weight (if given) has that shape.  No
            # flattening — the distance stays in the caller's (fusible)
            # layout end to end.
            if weight is not None:
                valid = weight > 0
                pred = tuple(jnp.where(valid, p, t)
                             for p, t in zip(pred, target))
            gp = gaussian_params(pred, self.center_offset)
            gt = gaussian_params(target, self.center_offset)
            loss = self.loss_fn(gp, gt, fun=self.fun, tau=self.tau,
                                alpha=self.alpha, **fkwargs)
            return self.loss_weight * weight_reduce_loss(
                loss, weight, reduction, avg_factor)

        pred = pred.reshape(-1, pred.shape[-1])
        target = target.reshape(-1, target.shape[-1])
        if weight is not None:
            weight = weight.reshape(pred.shape[0], -1) \
                if weight.ndim > 1 else weight
            if weight.ndim == 2 and weight.shape == pred.shape:
                weight = jnp.mean(weight, axis=-1)
            else:
                weight = weight.reshape(-1)
            # Neutralize invalid rows (branch-free zero-weight short-circuit).
            valid = (weight > 0)[:, None]
            pred = jnp.where(valid, pred, target)

        gp = gaussian_params(pred, self.center_offset)
        gt = gaussian_params(target, self.center_offset)
        loss = self.loss_fn(gp, gt, fun=self.fun, tau=self.tau,
                            alpha=self.alpha, **fkwargs)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


def gd_loss(loss_type: str, pred, target, weight=None, avg_factor=None,
            **cfg):
    """Functional one-shot form of :class:`GDLoss`."""
    return GDLoss(loss_type, **cfg)(pred, target, weight=weight,
                                    avg_factor=avg_factor)
