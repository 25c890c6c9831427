"""Pallas one-pass BN statistics vs flax.linen.BatchNorm (interpret mode).

Values, input/param gradients, and running-stat updates must match the
flax implementation the backbone used previously.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from mmdet3d_gaussian_tpu.ops.pallas import bn_kernel as bk
from mmdet3d_gaussian_tpu.ops.pallas.bn_kernel import FastBatchNorm


@pytest.fixture(autouse=True)
def _interpret():
    bk.INTERPRET, old_i = True, bk.INTERPRET
    bk.IMPL, old_m = 'pallas', bk.IMPL
    yield
    bk.INTERPRET, bk.IMPL = old_i, old_m


def _mk(seed=0, shape=(2, 24, 40, 16)):
    rng = np.random.RandomState(seed)
    return jnp.asarray((rng.randn(*shape) * 2 + 0.5).astype(np.float32))


def test_train_forward_and_grads_match_flax():
    x = _mk()
    fast = FastBatchNorm(use_running_average=False, momentum=0.99,
                         epsilon=1e-3)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.99,
                       epsilon=1e-3)
    vf = fast.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    # same init structure (drop-in): params.scale/bias, batch_stats.*
    assert set(vf['params']) == set(vr['params'])
    assert set(vf['batch_stats']) == set(vr['batch_stats'])

    w = jnp.asarray(np.random.RandomState(1).randn(*x.shape)
                    .astype(np.float32))

    def loss_fast(p, xx):
        y, aux = fast.apply({'params': p,
                             'batch_stats': vf['batch_stats']}, xx,
                            mutable=['batch_stats'])
        return jnp.sum(y * w), aux

    def loss_ref(p, xx):
        y, aux = ref.apply({'params': p,
                            'batch_stats': vr['batch_stats']}, xx,
                           mutable=['batch_stats'])
        return jnp.sum(y * w), aux

    (vfa, auxf), gf = jax.value_and_grad(loss_fast, argnums=(0, 1),
                                         has_aux=True)(vf['params'], x)
    (vra, auxr), gr = jax.value_and_grad(loss_ref, argnums=(0, 1),
                                         has_aux=True)(vr['params'], x)
    np.testing.assert_allclose(float(vfa), float(vra), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=1e-3, atol=1e-5)
    for k in ('scale', 'bias'):
        np.testing.assert_allclose(np.asarray(gf[0][k]),
                                   np.asarray(gr[0][k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for k in ('mean', 'var'):
        np.testing.assert_allclose(
            np.asarray(auxf['batch_stats'][k]),
            np.asarray(auxr['batch_stats'][k]),
            rtol=1e-4, atol=1e-6, err_msg=k)


def test_eval_mode_matches_flax():
    x = _mk(seed=2)
    fast = FastBatchNorm(use_running_average=True, epsilon=1e-3)
    ref = nn.BatchNorm(use_running_average=True, epsilon=1e-3)
    v = ref.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(lambda a: a, v)
    yf = fast.apply(v, x)
    yr = ref.apply(v, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=1e-5, atol=1e-6)


def test_nonpadded_rows():
    """Row count not a multiple of the kernel tile: padding must be inert."""
    x = _mk(seed=3, shape=(1, 7, 11, 8))   # 77 rows
    fast = FastBatchNorm(use_running_average=False)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.99,
                       epsilon=1e-3)
    vf = fast.init(jax.random.PRNGKey(0), x)
    yf, _ = fast.apply(vf, x, mutable=['batch_stats'])
    yr, _ = ref.apply(vf, x, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=1e-4, atol=1e-5)


def test_backbone_swap_preserves_checkpoint_structure():
    """SECOND with FastBatchNorm inits the same variable tree as before."""
    from mmdet3d_gaussian_tpu.models.backbones import SECOND
    x = jnp.zeros((1, 32, 32, 16), jnp.float32)
    net = SECOND(in_channels=16, out_channels=(16, 32),
                 layer_nums=(1, 1), layer_strides=(2, 2))
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    p = v['params']
    assert 'bn' in p['stage0_down'] and 'scale' in p['stage0_down']['bn']
    assert 'mean' in v['batch_stats']['stage0_down']['bn']
