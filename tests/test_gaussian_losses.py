"""Parity tests: component-wise JAX GD losses vs float64 NumPy matrix oracle.

Covers every loss in the bag, every postprocess nonlinearity, tau saturation,
weighting semantics, and gradient finiteness (the reference's correctness
surface per SURVEY.md §4).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.models.losses import (BAG_GD_LOSS, GDLoss,
                                                gaussian_params)
from .oracles import gd_losses_np as oracle


def random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-40, 40, (n, 3))
    dims = rng.uniform(0.3, 5.0, (n, 3))
    yaw = rng.uniform(-np.pi, np.pi, (n, 1))
    return np.concatenate([xyz, dims, yaw], -1).astype(np.float32)


def perturbed(boxes, scale=0.3, seed=1):
    rng = np.random.RandomState(seed)
    out = boxes.copy()
    out[:, :3] += rng.uniform(-scale, scale, (len(boxes), 3))
    out[:, 3:6] *= np.exp(rng.uniform(-scale, scale, (len(boxes), 3)))
    out[:, 6] += rng.uniform(-0.3, 0.3, len(boxes))
    return out.astype(np.float32)


CASES = [
    ('gwd3d', dict(fun='log1p', tau=1.0)),
    ('gwd3d', dict(fun='none', tau=0.0, normalize=False)),
    ('gwd3d', dict(fun='log1p', tau=2.0, alpha=2.0)),
    ('kld3d', dict(fun='log1p', tau=1.0)),
    ('kld3d', dict(fun='none', tau=0.0, sqrt=False)),
    ('kld3d', dict(fun='log1p', tau=5.0, alpha=0.5)),
    ('bd3d', dict(fun='log1p', tau=1.0)),
    ('bd3d', dict(fun='none', tau=0.0, sqrt=False)),
    ('jd3d', dict(fun='log1p', tau=1.0)),
    ('kld3d_symmax', dict(fun='log1p', tau=1.0)),
    ('kld3d_symmin', dict(fun='log1p', tau=1.0)),
    ('kfiou3d', dict(fun='expm1', tau=0.0)),
    ('kfiou3d', dict(fun='nlog', tau=0.0)),
]


@pytest.mark.parametrize('loss_type,kw', CASES)
def test_loss_matches_oracle(loss_type, kw):
    pred = random_boxes(64, seed=3)
    target = perturbed(pred, seed=4)

    gp = gaussian_params(jnp.asarray(pred))
    gt = gaussian_params(jnp.asarray(target))
    got = np.asarray(BAG_GD_LOSS[loss_type](gp, gt, **kw))

    want = oracle.BAG[loss_type](oracle.preprocess(pred),
                                 oracle.preprocess(target), **kw)
    # fp32 compute vs fp64 oracle: allow fp32-roundoff-level deviation
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize('loss_type,kw', CASES)
def test_loss_gradients_finite(loss_type, kw):
    pred = jnp.asarray(random_boxes(32, seed=5))
    target = jnp.asarray(perturbed(np.asarray(pred), seed=6))

    def f(p):
        gp = gaussian_params(p)
        gt = gaussian_params(target)
        return jnp.sum(BAG_GD_LOSS[loss_type](gp, gt, **kw))

    g = jax.grad(f)(pred)
    assert np.isfinite(np.asarray(g)).all()


def test_identical_boxes_zero_distance():
    boxes = jnp.asarray(random_boxes(16, seed=7))
    g = gaussian_params(boxes)
    for name in ('gwd3d', 'kld3d', 'bd3d', 'jd3d'):
        d = BAG_GD_LOSS[name](g, g, fun='none', tau=0.0)
        # fp32 cancellation noise floor at d ~ 0 (sqrt amplifies roundoff;
        # the reference's fp32 CUDA path has the same floor)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-2)


def test_gdloss_module_weighting():
    pred = jnp.asarray(random_boxes(32, seed=8))
    target = jnp.asarray(perturbed(np.asarray(pred), seed=9))
    loss_fn = GDLoss('kld3d', fun='log1p', tau=1.0, loss_weight=2.0,
                     reduction='mean')

    w = jnp.ones((32,))
    full = loss_fn(pred, target, weight=w, avg_factor=32.0)
    none = loss_fn(pred, target, weight=w, reduction_override='none')
    np.testing.assert_allclose(float(full), float(jnp.sum(none)) / 32.0,
                               rtol=1e-5)

    # pred-shaped weight collapses via mean(-1) (reference :295-296)
    w7 = jnp.ones((32, 7)) * 0.5
    half = loss_fn(pred, target, weight=w7, avg_factor=32.0)
    np.testing.assert_allclose(float(half), 0.5 * float(full), rtol=1e-5)


def test_gdloss_zero_weight_rows_no_nan_grad():
    """Rows with weight 0 (padding) must contribute 0 loss and 0 grad even if
    their pred is garbage — the jit-safe analogue of the reference's
    zero-weight short-circuit (gaussian_distance_loss.py:290-292)."""
    pred = np.asarray(random_boxes(8, seed=10))
    pred[4:] = 0.0  # degenerate rows: zero dims would otherwise explode logs
    pred = jnp.asarray(pred)
    target = jnp.asarray(random_boxes(8, seed=11))
    w = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], dtype=jnp.float32)
    loss_fn = GDLoss('kld3d')

    def f(p):
        return loss_fn(p, target, weight=w, avg_factor=4.0)

    val, grad = jax.value_and_grad(f)(pred)
    assert np.isfinite(float(val))
    grad = np.asarray(grad)
    assert np.isfinite(grad).all()
    np.testing.assert_allclose(grad[4:], 0.0)


def test_gdloss_all_zero_weight():
    pred = jnp.asarray(random_boxes(4, seed=12))
    target = jnp.asarray(random_boxes(4, seed=13))
    w = jnp.zeros((4,))
    out = GDLoss('gwd3d')(pred, target, weight=w, avg_factor=1.0)
    assert float(out) == 0.0


def test_jit_compatible():
    loss_fn = GDLoss('bd3d')
    f = jax.jit(lambda p, t, w: loss_fn(p, t, weight=w, avg_factor=16.0))
    pred = jnp.asarray(random_boxes(16, seed=14))
    target = jnp.asarray(perturbed(np.asarray(pred), seed=15))
    out = f(pred, target, jnp.ones((16,)))
    assert np.isfinite(float(out))


def test_sqrt_boundary_grad_finite():
    """Regression: sqrt'(0) = inf NaN'd training.  pred == target puts the
    distance exactly at the clip boundary; the gradient must stay finite
    and weight 0 must kill it completely (0 * finite = 0)."""
    boxes = jnp.asarray(random_boxes(8, seed=42))
    for loss_type in ('kld3d', 'gwd3d', 'bd3d', 'jd3d'):
        loss_fn = GDLoss(loss_type)
        w = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], dtype=jnp.float32)

        def f(p):
            return loss_fn(p, boxes, weight=w, avg_factor=4.0)

        g = np.asarray(jax.grad(f)(boxes))
        assert np.isfinite(g).all(), loss_type
        np.testing.assert_allclose(g[4:], 0.0, err_msg=loss_type)


def test_gdloss_parts_path_matches_array_path():
    """The component-plane input form (used by the anchor head's fused loss
    layout) must agree with the (N, 7) array form, values AND grads."""
    import jax
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.losses.gaussian import GDLoss

    rng = np.random.RandomState(3)
    pred = rng.randn(2, 5, 4, 7).astype(np.float32)
    pred[..., 3:6] = np.abs(pred[..., 3:6]) + 0.5
    tgt = pred + 0.1 * rng.randn(*pred.shape).astype(np.float32)
    tgt[..., 3:6] = np.abs(tgt[..., 3:6]) + 0.5
    w = (rng.rand(2, 5, 4) > 0.3).astype(np.float32)

    for loss_type, fun in (('kld3d', 'log1p'), ('gwd3d', 'log1p'),
                           ('kfiou3d', 'expm1')):
        loss = GDLoss(loss_type, fun=fun, tau=1.0 if fun == 'log1p' else 0.0,
                      loss_weight=3.0)

        def arr(p):
            return loss(p.reshape(-1, 7), jnp.asarray(tgt).reshape(-1, 7),
                        weight=jnp.asarray(w).reshape(-1, 1)
                        * jnp.ones((1, 7)), avg_factor=10.0)

        def parts(p):
            pp = tuple(p[..., i] for i in range(7))
            tp = tuple(jnp.asarray(tgt)[..., i] for i in range(7))
            return loss(pp, tp, weight=jnp.asarray(w), avg_factor=10.0)

        va, ga = jax.value_and_grad(arr)(jnp.asarray(pred))
        vp, gp = jax.value_and_grad(parts)(jnp.asarray(pred))
        np.testing.assert_allclose(float(va), float(vp), rtol=1e-5,
                                   err_msg=loss_type)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gp),
                                   rtol=1e-4, atol=1e-6, err_msg=loss_type)
