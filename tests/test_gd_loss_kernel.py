"""Fused Pallas anchor-GD-loss kernel vs the XLA component-plane path.

Runs the kernel through the Pallas interpreter on CPU (numerics identical
to the compiled TPU kernel up to reduction order): loss value AND
d(bbox_pred) must match the existing decode_parts + GDLoss plane path.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.core.bbox.coders import DeltaXYZWLHRBBoxCoder
from mmdet3d_gaussian_tpu.models.losses.gaussian import GDLoss
from mmdet3d_gaussian_tpu.ops.pallas import gd_loss_kernel as gdk


@pytest.fixture(autouse=True)
def _interpret():
    gdk.INTERPRET, old = True, gdk.INTERPRET
    yield
    gdk.INTERPRET = old


def _data(seed, b=2, hw=1024, a=6):
    rng = np.random.RandomState(seed)
    m = b * hw
    anc = np.zeros((hw, a, 7), np.float32)
    anc[..., 0] = rng.uniform(0, 60, (hw, a))
    anc[..., 1] = rng.uniform(-30, 30, (hw, a))
    anc[..., 2] = -1.78
    anc[..., 3:6] = np.array([1.6, 3.9, 1.56]) * rng.uniform(
        0.8, 1.2, (hw, a, 3))
    anc[..., 6] = rng.choice([0.0, np.pi / 2], (hw, a))
    pred = (rng.randn(m, a * 7) * 0.1).astype(np.float32)
    tgt = (rng.randn(m, a * 7) * 0.1).astype(np.float32)
    w = (rng.rand(m, a) < 0.1).astype(np.float32) * rng.uniform(
        0.5, 2.0, (m, a)).astype(np.float32)
    return anc, pred, tgt, w


def _xla_loss(gd, anc, pred, tgt, w, b, hw, a, avg):
    anc2 = np.broadcast_to(anc.reshape(1, hw, a, 7),
                           (b, hw, a, 7)).reshape(-1, 7)
    coder = DeltaXYZWLHRBBoxCoder()
    anc_parts = tuple(jnp.asarray(anc2[:, i]) for i in range(7))

    def f(pred_flat):
        p7 = pred_flat.reshape(-1, 7)
        t7 = jnp.asarray(tgt.reshape(-1, 7))
        pp = tuple(p7[:, i] for i in range(7))
        tp = tuple(t7[:, i] for i in range(7))
        dec_p = coder.decode_parts(anc_parts, pp)
        dec_t = coder.decode_parts(anc_parts, tp)
        return gd(dec_p, dec_t, weight=jnp.asarray(w.reshape(-1)),
                  avg_factor=avg)
    return f


CFGS = [
    dict(loss_type='kld3d', fun='log1p', tau=1.0, loss_weight=5.0),
    dict(loss_type='gwd3d', fun='log1p', tau=1.0, loss_weight=5.0),
    dict(loss_type='bd3d', fun='log1p', tau=1.0, loss_weight=5.0),
    dict(loss_type='kfiou3d', fun='nlog', tau=0.0, loss_weight=5.0),
]


@pytest.mark.parametrize('cfg', CFGS,
                         ids=[c['loss_type'] for c in CFGS])
def test_kernel_matches_plane_path(cfg):
    b, hw, a = 2, 1024, 6
    anc, pred, tgt, w = _data(0, b, hw, a)
    gd = GDLoss(center_offset=(0, 0, 0.5), **cfg)
    avg = 7.0

    f_ref = _xla_loss(gd, anc, pred, tgt, w, b, hw, a, avg)
    ref_val, ref_grad = jax.value_and_grad(f_ref)(jnp.asarray(pred))

    kcfg = (gd.loss_type, gd.center_offset, gd.fun, float(gd.tau),
            float(gd.alpha))
    anc2 = jnp.asarray(anc.reshape(hw, a * 7))

    def f_k(p):
        raw = gdk.anchor_gd_loss_pallas(p, jnp.asarray(tgt),
                                        jnp.asarray(w), anc2, hw, kcfg)
        return gd.loss_weight * raw / avg

    val, grad = jax.value_and_grad(f_k)(jnp.asarray(pred))
    np.testing.assert_allclose(float(val), float(ref_val),
                               rtol=1e-5, atol=1e-7)
    # atol: single-element f32 reduction-order noise at ~1e-6 absolute
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=5e-6)


def test_head_loss_identical_under_kernel():
    """GDAnchor3DHead.loss with IMPL='pallas' (interpret) == IMPL='xla'."""
    from mmdet3d_gaussian_tpu.models.dense_heads.anchor3d_head import (
        GDAnchor3DHead, AnchorTargets)
    rng = np.random.RandomState(1)
    h = w = 32
    head = GDAnchor3DHead(
        num_classes=3,
        anchor_generator=dict(
            ranges=[[0, -39.68, -0.6, 69.12, 39.68, -0.6],
                    [0, -39.68, -0.6, 69.12, 39.68, -0.6],
                    [0, -39.68, -1.78, 69.12, 39.68, -1.78]],
            sizes=[[0.8, 0.6, 1.73], [1.76, 0.6, 1.73], [3.9, 1.6, 1.56]],
            rotations=[0, 1.57]),
        assigners=[dict(pos_iou_thr=0.5, neg_iou_thr=0.35,
                        min_pos_iou=0.35)] * 3,
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                       loss_weight=2.0),
        loss_decoded_bbox=dict(type='GDLoss', loss_type='kld3d',
                               center_offset=(0, 0, 0.5), fun='log1p',
                               tau=1.0, loss_weight=5.0),
        loss_dir=dict(type='CrossEntropyLoss', loss_weight=0.2),
        code_weight=[0.] * 7, decode_weight=1.0)
    anchors = head.anchors_for((h, w))
    a = anchors.shape[2] * anchors.shape[3]
    n = h * w * a
    b = 2
    cls_score = rng.randn(b, h, w, a * 3).astype(np.float32)
    bbox_pred = (rng.randn(b, h, w, a * 7) * 0.1).astype(np.float32)
    dir_pred = rng.randn(b, h, w, a * 2).astype(np.float32)
    pos = rng.rand(b, n) < 0.1
    tb = AnchorTargets(
        labels=jnp.asarray(np.where(pos, rng.randint(0, 3, (b, n)), 3)
                           .astype(np.int32)),
        label_weights=jnp.ones((b, n), jnp.float32),
        bbox_targets=jnp.asarray(
            (rng.randn(b, n, 7) * 0.1 * pos[..., None]).astype(np.float32)),
        bbox_weights=jnp.asarray(pos.astype(np.float32)),
        dir_targets=jnp.asarray(
            (rng.randint(0, 2, (b, n)) * pos).astype(np.int32)),
        num_pos=jnp.asarray(pos.sum(), jnp.int32).reshape(()) * jnp.ones(
            (b,), jnp.int32) // b,
    )

    args = (jnp.asarray(cls_score), jnp.asarray(bbox_pred),
            jnp.asarray(dir_pred), jnp.asarray(anchors), tb)
    old = gdk.IMPL
    try:
        gdk.IMPL = 'xla'
        ref = head.loss(*args)
        gdk.IMPL = 'pallas'
        out = head.loss(*args)
    finally:
        gdk.IMPL = old
    for k in ref:
        np.testing.assert_allclose(float(out[k]), float(ref[k]),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=k)
