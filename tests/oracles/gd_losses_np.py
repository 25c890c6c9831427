"""Float64 NumPy oracle for the Gaussian-distance losses.

Deliberately written in the *matrix* formulation (explicit 2x2 covariance
matrices, einsum products) so it is an independent cross-check of the
component-wise closed forms in
``mmdet3d_gaussian_tpu/models/losses/gaussian.py``.  Semantics follow the
derivation documented in the reference
``mmdet3d_gaussian/models/losses/gaussian_distance_loss.py`` (docstring at
lines 44-75): Sigma = blockdiag(R S^2 R^T, Sl^2) with S = diag(dims[:2])/2,
Sl = dims[2]/2, dims clamped to [1e-7, 1e7].
"""
import numpy as np


def preprocess(boxes, center_offset=(0., 0., 0.5)):
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 7)
    off = np.asarray(center_offset, dtype=np.float64)
    xyz = boxes[:, :3] + off[None] * boxes[:, 3:6]
    wh = np.clip(boxes[:, 3:5], 1e-7, 1e7)
    l = np.clip(boxes[:, 5], 1e-7, 1e7)
    r = boxes[:, 6]
    c, s = np.cos(r), np.sin(r)
    R = np.stack([c, -s, s, c], axis=-1).reshape(-1, 2, 2)
    S = 0.5 * np.stack([np.diag(x) for x in wh])
    Sl = 0.5 * l
    return xyz, R, S, Sl


def postprocess(d, fun='log1p', tau=1.0):
    if fun == 'log1p':
        d = np.log1p(d)
    elif fun == 'expm1':
        d = np.expm1(d)
    elif fun == 'nlog':
        d = -np.log(1 - d + 1e-7)
    elif fun != 'none':
        raise ValueError(fun)
    if tau >= 1.0:
        return 1 - tau / (tau + d)
    return d


def _sigma(R, S):
    return np.einsum('nij,njk,nlk->nil', R, S ** 2, R)


def gwd3d(pred, target, fun='log1p', tau=1.0, alpha=1.0, normalize=True):
    xyz_p, R_p, S_p, Sl_p = pred
    xyz_t, R_t, S_t, Sl_t = target
    xyz_d = ((xyz_p - xyz_t) ** 2).sum(-1)
    diag_p = np.diagonal(S_p, axis1=-2, axis2=-1)
    diag_t = np.diagonal(S_t, axis1=-2, axis2=-1)
    whlr = (diag_p ** 2).sum(-1) + (diag_t ** 2).sum(-1)
    Sig_p, Sig_t = _sigma(R_p, S_p), _sigma(R_t, S_t)
    prod = np.einsum('nij,njk->nik', Sig_p, Sig_t)
    tr = np.trace(prod, axis1=-2, axis2=-1)
    det_sqrt = diag_p.prod(-1) * diag_t.prod(-1)
    whlr = whlr - 2 * np.sqrt(np.clip(tr + 2 * det_sqrt, 0, None))
    whlr = whlr + (Sl_p - Sl_t) ** 2
    d = np.sqrt(np.clip(xyz_d + alpha * alpha * whlr, 0, None))
    if normalize:
        scale = 2 * np.exp((np.log(det_sqrt) + np.log(Sl_p) + np.log(Sl_t)) / 6)
        d = d / scale
    return postprocess(d, fun, tau)


def kld3d(pred, target, fun='log1p', tau=1.0, alpha=1.0, sqrt=True):
    xyz_p, R_p, S_p, Sl_p = pred
    xyz_t, R_t, S_t, Sl_t = target
    S_p_inv = np.stack([np.diag(1.0 / np.diag(m)) for m in S_p])
    Sig_p_inv = _sigma(R_p, S_p_inv)
    Sig_t = _sigma(R_t, S_t)
    dxy = (xyz_p[:, :2] - xyz_t[:, :2])[..., None]
    dz = xyz_p[:, 2] - xyz_t[:, 2]
    xyz_d = 0.5 * np.einsum('nji,njk,nkl->nil', dxy, Sig_p_inv,
                            dxy).reshape(-1)
    xyz_d = xyz_d + 0.5 * dz ** 2 / Sl_p ** 2
    whlr = 0.5 * np.trace(np.einsum('nij,njk->nik', Sig_p_inv, Sig_t),
                          axis1=-2, axis2=-1)
    whlr = whlr + 0.5 * Sl_t ** 2 / Sl_p ** 2
    log_p = np.log(np.diagonal(S_p, axis1=-2, axis2=-1)).sum(-1) + np.log(Sl_p)
    log_t = np.log(np.diagonal(S_t, axis1=-2, axis2=-1)).sum(-1) + np.log(Sl_t)
    whlr = whlr + (log_p - log_t) - 1.5
    d = xyz_d / (alpha * alpha) + whlr
    if sqrt:
        d = np.sqrt(np.clip(d, 0, None))
    return postprocess(d, fun, tau)


def bd3d(pred, target, fun='log1p', tau=1.0, alpha=1.0, sqrt=True):
    xyz_p, R_p, S_p, Sl_p = pred
    xyz_t, R_t, S_t, Sl_t = target
    Sig = 0.5 * (_sigma(R_p, S_p) + _sigma(R_t, S_t))
    Sigl = 0.5 * (Sl_p ** 2 + Sl_t ** 2)
    det = np.clip(Sig[:, 0, 0] * Sig[:, 1, 1] - Sig[:, 0, 1] * Sig[:, 1, 0],
                  1e-7, None)
    inv = np.stack([Sig[:, 1, 1], -Sig[:, 0, 1], -Sig[:, 1, 0], Sig[:, 0, 0]],
                   axis=-1).reshape(-1, 2, 2) / det[:, None, None]
    dxy = (xyz_p[:, :2] - xyz_t[:, :2])[..., None]
    dz = xyz_p[:, 2] - xyz_t[:, 2]
    xyz_d = 0.125 * np.einsum('nji,njk,nkl->nil', dxy, inv, dxy).reshape(-1)
    xyz_d = xyz_d + 0.125 * dz ** 2 / Sigl
    whlr = 0.5 * (np.log(det) + np.log(Sigl))
    whlr -= 0.25 * (np.log(np.diagonal(S_p ** 2, axis1=-2, axis2=-1)).sum(-1)
                    + np.log(Sl_p ** 2))
    whlr -= 0.25 * (np.log(np.diagonal(S_t ** 2, axis1=-2, axis2=-1)).sum(-1)
                    + np.log(Sl_t ** 2))
    d = xyz_d / (alpha * alpha) + whlr
    if sqrt:
        d = np.sqrt(np.clip(d, 0, None))
    return postprocess(d, fun, tau)


def jd3d(pred, target, fun='log1p', tau=1.0, alpha=1.0, sqrt=True):
    jd = 0.5 * (kld3d(pred, target, 'none', 0., alpha, False)
                + kld3d(target, pred, 'none', 0., alpha, False))
    if sqrt:
        jd = np.sqrt(np.clip(jd, 0, None))
    return postprocess(jd, fun, tau)


def kld3d_symmax(pred, target, fun='log1p', tau=1.0, alpha=1.0, sqrt=True):
    return postprocess(np.maximum(kld3d(pred, target, 'none', 0., alpha, sqrt),
                                  kld3d(target, pred, 'none', 0., alpha, sqrt)),
                       fun, tau)


def kld3d_symmin(pred, target, fun='log1p', tau=1.0, alpha=1.0, sqrt=True):
    return postprocess(np.minimum(kld3d(pred, target, 'none', 0., alpha, sqrt),
                                  kld3d(target, pred, 'none', 0., alpha, sqrt)),
                       fun, tau)


def kfiou3d(pred, target, fun='expm1', tau=0.0, alpha=1.0, sqrt=False):
    xyz_p, R_p, S_p, Sl_p = pred
    xyz_t, R_t, S_t, Sl_t = target
    Sig = _sigma(R_p, S_p) + _sigma(R_t, S_t)
    det = ((Sig[:, 0, 0] * Sig[:, 1, 1] - Sig[:, 0, 1] * Sig[:, 1, 0])
           * (Sl_p ** 2 + Sl_t ** 2))
    vol_p = np.diagonal(S_p, axis1=-2, axis2=-1).prod(-1) * Sl_p
    vol_t = np.diagonal(S_t, axis1=-2, axis2=-1).prod(-1) * Sl_t
    inter = vol_p * vol_t / np.sqrt(np.clip(det, 1e-7, None))
    union = np.clip(vol_p + vol_t - inter, 1e-7, None)
    return postprocess(1 - 4.656854249492381 * (inter / union), fun, 0.0)


BAG = dict(gwd3d=gwd3d, kld3d=kld3d, jd3d=jd3d, kld3d_symmax=kld3d_symmax,
           kld3d_symmin=kld3d_symmin, bd3d=bd3d, kfiou3d=kfiou3d)
