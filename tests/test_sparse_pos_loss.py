"""Sparse-positive anchor loss (pos_cap > 0) == dense loss over all anchors.

The decoded-box GD / sin-diff / direction losses only see positive anchors,
so gathering the first-K positives and computing on (B, K) rows must give
the same loss values and parameter gradients as the dense (B, A) path
whenever num_pos <= K."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdet3d_gaussian_tpu.engine.detector import (PointPillarsDetector,
                                                  synthetic_batch)

TINY = dict(
    voxel_size=(0.4, 0.4, 4.0),
    point_cloud_range=(0., -12.8, -3., 25.6, 12.8, 1.),
    max_points_per_voxel=16,
    max_voxels_per_sample=1024,
    voxelize_mode='dynamic',
    encoder_cfg=dict(in_channels=4, feat_channels=(16,)),
    backbone_cfg=dict(in_channels=16, out_channels=(16, 32, 64),
                      layer_nums=(1, 1, 1), layer_strides=(2, 2, 2)),
    neck_cfg=dict(in_channels=(16, 32, 64), out_channels=(16, 16, 16),
                  upsample_strides=(1, 2, 4)),
    head_cfg=dict(num_classes=3, num_anchors=6, feat_channels=48),
)


@pytest.mark.parametrize('head_over', [
    {},                                     # default: GD loss only
    dict(code_weight=[1.0] * 7, decode_weight=None,
         loss_decoded_bbox=None),           # sin-diff SmoothL1 path
])
def test_sparse_loss_matches_dense(head_over):
    batch = synthetic_batch(batch_size=2, num_points=1024, num_gt=8,
                            pc_range=TINY['point_cloud_range'])
    dense = PointPillarsDetector(model_cfg=TINY,
                                 head_cfg=dict(pos_cap=0, **head_over))
    sparse = PointPillarsDetector(model_cfg=TINY,
                                  head_cfg=dict(pos_cap=128, **head_over))
    variables = jax.jit(dense.init)(jax.random.PRNGKey(0), batch)

    def run(det):
        def f(params):
            vs = dict(variables, params=params)
            outs, _ = det.apply_train(vs, batch)
            loss, parts = det.loss(outs, batch)
            return loss, parts
        (l, parts), g = jax.jit(
            jax.value_and_grad(f, has_aux=True))(variables['params'])
        return l, parts, g

    l_d, parts_d, g_d = run(dense)
    l_s, parts_s, g_s = run(sparse)
    np.testing.assert_allclose(float(l_d), float(l_s), rtol=1e-5)
    for k in parts_d:
        np.testing.assert_allclose(np.asarray(parts_d[k]),
                                   np.asarray(parts_s[k]), rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_d),
                     jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)


def test_sparse_drops_overflow_deterministically():
    """With pos_cap smaller than num_pos, the lowest-index positives are
    kept — deterministic, documented deviation."""
    batch = synthetic_batch(batch_size=1, num_points=1024, num_gt=8,
                            pc_range=TINY['point_cloud_range'])
    det = PointPillarsDetector(model_cfg=TINY, head_cfg=dict(pos_cap=2))
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)
    outs, _ = jax.jit(det.apply_train)(variables, batch)
    loss, parts = jax.jit(det.loss)(outs, batch)
    assert np.isfinite(float(loss))
