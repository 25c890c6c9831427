"""Space-to-depth canvas path: exact equivalence with the plain canvas.

The s2d splat (``ops/voxelize.bev_scatter_s2d``) + folded 2x2 stage-0 conv
(``models/backbones.fold_s2d_kernel``) must compute the SAME function as
the plain (B, ny, nx, C) splat + 3x3/stride-2 conv — only the tensor
layout (and TPU HBM cost) differs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdet3d_gaussian_tpu.engine.detector import (PointPillarsDetector,
                                                  synthetic_batch)
from mmdet3d_gaussian_tpu.models.backbones import fold_s2d_kernel

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


def test_fold_s2d_kernel_matches_strided_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 12, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # space-to-depth: (B, H/2, W/2, 4C), parity index (py*2+px)
    b, h, wd, c = x.shape
    xs = x.reshape(b, h // 2, 2, wd // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, h // 2, wd // 2, 4 * c)
    got = jax.lax.conv_general_dilated(
        xs, fold_s2d_kernel(w), window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_w2_kernel_matches_plain_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 16, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 6).astype(np.float32))
    from mmdet3d_gaussian_tpu.models.backbones import (fold_w2_kernel,
                                                       unfold_w2)
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # W-fold the input: channel q*C+c = pixel (h, 2*w1+q, c)
    b, h, wd, c = x.shape
    xw = x.reshape(b, h, wd // 2, 2, c).reshape(b, h, wd // 2, 2 * c)
    got = jax.lax.conv_general_dilated(
        xw, fold_w2_kernel(w), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(unfold_w2(got)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_s2d_to_w2_kernel_matches_strided_conv():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 24, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    from mmdet3d_gaussian_tpu.models.backbones import (
        fold_s2d_to_w2_kernel, unfold_w2)
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    b, h, wd, c = x.shape
    xs = x.reshape(b, h // 2, 2, wd // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, h // 2, wd // 2, 4 * c)
    got = jax.lax.conv_general_dilated(
        xs, fold_s2d_to_w2_kernel(w), window_strides=(1, 2),
        padding=((1, 0), (1, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(unfold_w2(got)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('mode', ['train', 'eval'])
def test_s2d_model_matches_plain(mode):
    batch = synthetic_batch(batch_size=2, num_points=1024, num_gt=8,
                            pc_range=TINY['point_cloud_range'])
    det_off = PointPillarsDetector(
        model_cfg=dict(TINY, s2d_canvas='off'))
    det_on = PointPillarsDetector(
        model_cfg=dict(TINY, s2d_canvas='on'))
    variables = jax.jit(det_off.init)(jax.random.PRNGKey(0), batch)
    # identical parameter trees: the s2d stage-0 conv keeps ConvBNReLU's
    # checkpoint structure (conv/kernel (3,3,Cin,Cout) + bn)
    chex_tree = jax.tree_util.tree_structure(
        jax.jit(det_on.init)(jax.random.PRNGKey(0), batch))
    assert jax.tree_util.tree_structure(variables) == chex_tree

    if mode == 'train':
        out_off, _ = jax.jit(det_off.apply_train)(variables, batch)
        out_on, _ = jax.jit(det_on.apply_train)(variables, batch)
    else:
        out_off = jax.jit(det_off.apply_eval)(variables, batch)
        out_on = jax.jit(det_on.apply_eval)(variables, batch)
    for a, b_ in zip(jax.tree_util.tree_leaves(out_off),
                     jax.tree_util.tree_leaves(out_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


TINY_WAYMO = dict(
    TINY,
    voxelize_mode='hard',
    backbone_cfg=dict(in_channels=16, out_channels=(16, 32, 64),
                      layer_nums=(1, 1, 1), layer_strides=(1, 2, 2)),
)


@pytest.mark.parametrize('vox', ['hard', 'dynamic'])
def test_wfold_model_matches_plain(vox):
    """Stride-1 first stage: W-folded canvas + stage 0 == plain path."""
    cfg = dict(TINY_WAYMO, voxelize_mode=vox)
    batch = synthetic_batch(batch_size=2, num_points=1024, num_gt=8,
                            pc_range=cfg['point_cloud_range'])
    det_off = PointPillarsDetector(model_cfg=dict(cfg, s2d_canvas='off'))
    det_on = PointPillarsDetector(model_cfg=cfg)
    variables = jax.jit(det_off.init)(jax.random.PRNGKey(0), batch)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(
                jax.jit(det_on.init)(jax.random.PRNGKey(0), batch)))

    def loss_grad(det):
        def f(params):
            vs = dict(variables, params=params)
            outs, _ = det.apply_train(vs, batch)
            return det.loss(outs, batch)[0]
        return jax.jit(jax.value_and_grad(f))(variables['params'])

    l_off, g_off = loss_grad(det_off)
    l_on, g_on = loss_grad(det_on)
    np.testing.assert_allclose(float(l_off), float(l_on), rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_off),
                     jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize('first_stride', [1, 2])
def test_sorted_hard_encoder_matches_packed(first_stride):
    """hard_encoder='sorted' == 'packed' (same params), incl. pillars
    over max_points capacity and empty pillars."""
    bb = dict(in_channels=16, out_channels=(16, 32, 64),
              layer_nums=(1, 1, 1), layer_strides=(first_stride, 2, 2))
    cfg = dict(TINY, voxelize_mode='hard', max_points_per_voxel=4,
               backbone_cfg=bb)
    rng = np.random.RandomState(0)
    pts = rng.uniform([0., -12.8, -3., 0.], [25.6, 12.8, 1., 1.],
                      (2, 512, 4)).astype(np.float32)
    pts[0, 100:140] = pts[0, 0]     # 40 points in one pillar (cap 4)
    batch = synthetic_batch(batch_size=2, num_points=512, num_gt=8,
                            pc_range=cfg['point_cloud_range'])
    batch['points'] = pts

    packed = PointPillarsDetector(model_cfg=dict(cfg, hard_encoder='packed'))
    srt = PointPillarsDetector(model_cfg=dict(cfg, hard_encoder='sorted'))
    variables = jax.jit(packed.init)(jax.random.PRNGKey(0), batch)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(
                jax.jit(srt.init)(jax.random.PRNGKey(1), batch)))

    def loss_grad(det):
        def f(params):
            vs = dict(variables, params=params)
            outs, _ = det.apply_train(vs, batch)
            return det.loss(outs, batch)[0]
        return jax.jit(jax.value_and_grad(f))(variables['params'])

    l_p, g_p = loss_grad(packed)
    l_s, g_s = loss_grad(srt)
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_p),
                     jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-4)


def test_s2d_gradients_match_plain():
    batch = synthetic_batch(batch_size=2, num_points=1024, num_gt=8,
                            pc_range=TINY['point_cloud_range'])
    det_off = PointPillarsDetector(model_cfg=dict(TINY, s2d_canvas='off'))
    det_on = PointPillarsDetector(model_cfg=dict(TINY, s2d_canvas='on'))
    variables = jax.jit(det_off.init)(jax.random.PRNGKey(0), batch)

    def loss_of(det):
        def f(params):
            vs = dict(variables, params=params)
            outs, _ = det.apply_train(vs, batch)
            return det.loss(outs, batch)[0]
        return jax.jit(jax.value_and_grad(f))

    l_off, g_off = loss_of(det_off)(variables['params'])
    l_on, g_on = loss_of(det_on)(variables['params'])
    np.testing.assert_allclose(float(l_off), float(l_on), rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_off),
                     jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-4)
