"""Depth-to-space neck lowering: exact equivalence with ConvTranspose.

``SECONDFPN`` deblocks with stride > 1 mirror the reference neck's
``build_upsample_layer`` ConvTranspose (ref
``configs/_base_/models/hv_pointpillars_secfpn_kitti.py:33-42``).  A
kernel-size == stride ConvTranspose has no tap overlap, so it equals a
1x1 conv to ``s*s*C`` channels followed by depth-to-space — a pure MXU
matmul at full 128-lane tiles instead of XLA's input-dilated transposed
conv lowering.  ``SECONDFPN.deconv_impl`` selects the lowering (module
config, so jit caches key on it; MMDET3D_TPU_DECONV only sets the
import-time default); the variable tree is byte-identical so checkpoints
transfer 1:1.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdet3d_gaussian_tpu.models.backbones import SECONDFPN


def _neck(impl, dtype=None):
    return SECONDFPN(in_channels=(64, 128, 256),
                     out_channels=(128, 128, 128),
                     upsample_strides=(1, 2, 4),
                     dtype=dtype, deconv_impl=impl)


def _feats(dtype=np.float32):
    rs = np.random.RandomState(0)
    return [jnp.asarray(0.1 * rs.randn(2, 24 // s, 20 // s, c), dtype)
            for s, c in ((1, 64), (2, 128), (4, 256))]


@pytest.mark.parametrize('dtype,tol', [(None, 1e-5), ('bfloat16', 2e-2)])
def test_d2s_neck_matches_convtranspose(dtype, tol):
    # bf16 row pins the d2s branch's manual cast path (backbones.py
    # deconv_impl=='d2s' casts x and the folded 1x1 kernel by hand, where
    # the convt branch relies on nn.ConvTranspose(dtype=...)).
    feats = _feats()
    vs = _neck('convt', dtype).init(jax.random.PRNGKey(0), feats, True)

    outs, stats = {}, {}
    for impl in ('convt', 'd2s'):
        neck = _neck(impl, dtype)
        y, mut = neck.apply(vs, feats, True, mutable=['batch_stats'])
        outs[impl], stats[impl] = np.asarray(y, np.float32), \
            mut['batch_stats']
        # eval mode: same matmul, different placement only
        ye = neck.apply(vs, feats, False)
        outs[impl + '/eval'] = np.asarray(ye, np.float32)

    np.testing.assert_allclose(outs['convt'], outs['d2s'],
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(outs['convt/eval'], outs['d2s/eval'],
                               rtol=tol if dtype else 1e-6,
                               atol=tol if dtype else 1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(stats['convt']),
                    jax.tree_util.tree_leaves(stats['d2s'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tol if dtype else 1e-6,
                                   atol=tol if dtype else 1e-8)


def test_d2s_neck_same_variable_tree():
    feats = _feats()
    va = _neck('convt').init(jax.random.PRNGKey(0), feats, True)
    vb = _neck('d2s').init(jax.random.PRNGKey(0), feats, True)
    assert (jax.tree_util.tree_structure(va)
            == jax.tree_util.tree_structure(vb))
    for a, b in zip(jax.tree_util.tree_leaves(va),
                    jax.tree_util.tree_leaves(vb)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_d2s_neck_gradients_match():
    feats = _feats()
    vs = _neck('convt').init(jax.random.PRNGKey(0), feats, True)

    def loss(params, impl):
        y, _ = _neck(impl).apply({'params': params,
                                  'batch_stats': vs['batch_stats']},
                                 feats, True, mutable=['batch_stats'])
        return jnp.sum(y * y)

    ga = jax.grad(lambda p: loss(p, 'convt'))(vs['params'])
    gb = jax.grad(lambda p: loss(p, 'd2s'))(vs['params'])
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
