"""Depth-to-space neck lowering: exact equivalence with ConvTranspose.

``SECONDFPN`` deblocks with stride > 1 mirror the reference neck's
``build_upsample_layer`` ConvTranspose (ref
``configs/_base_/models/hv_pointpillars_secfpn_kitti.py:33-42``).  A
kernel-size == stride ConvTranspose has no tap overlap, so it equals a
1x1 conv to ``s*s*C`` channels followed by depth-to-space — a pure MXU
matmul at full 128-lane tiles instead of XLA's input-dilated transposed
conv lowering.  ``MMDET3D_TPU_DECONV=d2s`` flips the lowering; the
variable tree is byte-identical so checkpoints transfer 1:1.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdet3d_gaussian_tpu.models.backbones import SECONDFPN


@pytest.fixture()
def _restore_deconv_env():
    old = os.environ.get('MMDET3D_TPU_DECONV')
    yield
    if old is None:
        os.environ.pop('MMDET3D_TPU_DECONV', None)
    else:
        os.environ['MMDET3D_TPU_DECONV'] = old


def _feats(dtype=np.float32):
    rs = np.random.RandomState(0)
    return [jnp.asarray(0.1 * rs.randn(2, 24 // s, 20 // s, c), dtype)
            for s, c in ((1, 64), (2, 128), (4, 256))]


def test_d2s_neck_matches_convtranspose(_restore_deconv_env):
    neck = SECONDFPN(in_channels=(64, 128, 256),
                     out_channels=(128, 128, 128),
                     upsample_strides=(1, 2, 4))
    feats = _feats()
    os.environ['MMDET3D_TPU_DECONV'] = 'convt'
    vs = neck.init(jax.random.PRNGKey(0), feats, True)

    outs, stats = {}, {}
    for impl in ('convt', 'd2s'):
        os.environ['MMDET3D_TPU_DECONV'] = impl
        y, mut = neck.apply(vs, feats, True, mutable=['batch_stats'])
        outs[impl], stats[impl] = np.asarray(y), mut['batch_stats']
        # eval mode is bit-exact (same matmul, different placement only)
        ye = neck.apply(vs, feats, False)
        outs[impl + '/eval'] = np.asarray(ye)

    np.testing.assert_allclose(outs['convt'], outs['d2s'],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs['convt/eval'], outs['d2s/eval'],
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(stats['convt']),
                    jax.tree_util.tree_leaves(stats['d2s'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_d2s_neck_same_variable_tree(_restore_deconv_env):
    neck = SECONDFPN(in_channels=(64, 128, 256),
                     out_channels=(128, 128, 128),
                     upsample_strides=(1, 2, 4))
    feats = _feats()
    os.environ['MMDET3D_TPU_DECONV'] = 'convt'
    va = neck.init(jax.random.PRNGKey(0), feats, True)
    os.environ['MMDET3D_TPU_DECONV'] = 'd2s'
    vb = neck.init(jax.random.PRNGKey(0), feats, True)
    assert (jax.tree_util.tree_structure(va)
            == jax.tree_util.tree_structure(vb))
    for a, b in zip(jax.tree_util.tree_leaves(va),
                    jax.tree_util.tree_leaves(vb)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_d2s_neck_gradients_match(_restore_deconv_env):
    neck = SECONDFPN(in_channels=(64, 128, 256),
                     out_channels=(128, 128, 128),
                     upsample_strides=(1, 2, 4))
    feats = _feats()
    os.environ['MMDET3D_TPU_DECONV'] = 'convt'
    vs = neck.init(jax.random.PRNGKey(0), feats, True)

    def loss(params, impl):
        os.environ['MMDET3D_TPU_DECONV'] = impl
        y, _ = neck.apply({'params': params,
                           'batch_stats': vs['batch_stats']},
                          feats, True, mutable=['batch_stats'])
        return jnp.sum(y * y)

    ga = jax.grad(lambda p: loss(p, 'convt'))(vs['params'])
    gb = jax.grad(lambda p: loss(p, 'd2s'))(vs['params'])
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
