"""Image branch + point fusion + MVX detector on tiny shapes."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.models.img_fusion import (
    ImgBackbone, ImgFPNNeck, PointFusion, bilinear_sample_img,
    project_points_to_img)
from mmdet3d_gaussian_tpu.engine.mvx import MVXDetector, synthetic_mvx_batch


def test_projection_known_pinhole():
    # camera at origin looking down +x; fx=fy=100, cx=32, cy=24
    cam = np.array([[0., -1., 0., 0.], [0., 0., -1., 0.],
                    [1., 0., 0., 0.], [0., 0., 0., 1.]], np.float32)
    K = np.array([[100., 0., 32., 0.], [0., 100., 24., 0.],
                  [0., 0., 1., 0.], [0., 0., 0., 1.]], np.float32)
    l2i = jnp.asarray(K @ cam)
    pts = jnp.asarray([
        [10., 0., 0.],      # on the optical axis -> principal point
        [10., -1., 0.],     # 1m right of axis -> u = cx + fx/10
        [10., 0., 1.],      # 1m up -> v = cy - fy/10
        [-5., 0., 0.],      # behind the camera -> invalid
    ])
    uv, valid = project_points_to_img(pts, l2i, (48, 64))
    uv = np.asarray(uv)
    np.testing.assert_allclose(uv[0], [32., 24.], atol=1e-4)
    np.testing.assert_allclose(uv[1], [42., 24.], atol=1e-4)
    np.testing.assert_allclose(uv[2], [32., 14.], atol=1e-4)
    assert list(np.asarray(valid)) == [True, True, True, False]


def test_bilinear_sample_img_exact_and_interp():
    feat = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
    out = np.asarray(bilinear_sample_img(
        feat, jnp.asarray([[1., 1.], [1.5, 0.], [0., 0.5]])))
    assert out[0, 0] == 5.0                       # exact pixel (y=1, x=1)
    assert out[1, 0] == pytest.approx(1.5)        # between cols 1 and 2
    assert out[2, 0] == pytest.approx(2.0)        # between rows 0 and 1

def test_img_backbone_fpn_shapes():
    bb = ImgBackbone(stage_channels=(8, 16), blocks_per_stage=1)
    neck = ImgFPNNeck(out_channels=8)
    img = jnp.zeros((2, 32, 64, 3))
    v = bb.init(jax.random.PRNGKey(0), img)
    feats, _ = bb.apply(v, img, train=True, mutable=['batch_stats'])
    assert feats[0].shape == (2, 8, 16, 8)     # stride 4
    assert feats[1].shape == (2, 4, 8, 16)     # stride 8
    nv = neck.init(jax.random.PRNGKey(1), feats)
    outs = neck.apply(nv, feats)
    assert [o.shape for o in outs] == [(2, 8, 16, 8), (2, 4, 8, 8)]


def test_point_fusion_zeros_offscreen():
    cam = np.array([[0., -1., 0., 0.], [0., 0., -1., 0.],
                    [1., 0., 0., 0.], [0., 0., 0., 1.]], np.float32)
    K = np.array([[100., 0., 32., 0.], [0., 100., 24., 0.],
                  [0., 0., 1., 0.], [0., 0., 0., 1.]], np.float32)
    l2i = jnp.asarray((K @ cam)[None])
    feats = [jnp.ones((1, 12, 16, 4)), jnp.ones((1, 6, 8, 4))]
    pts = jnp.asarray([[[10., 0., 0.], [-5., 0., 0.]]])   # valid, behind
    fuse = PointFusion(out_channels=8, img_levels=(4, 8))
    v = fuse.init(jax.random.PRNGKey(0), feats, pts, l2i, (48, 64))
    out = np.asarray(fuse.apply(v, feats, pts, l2i, (48, 64)))
    assert out.shape == (1, 2, 8)
    assert np.abs(out[0, 1]).max() == 0.0      # behind camera -> zeroed
    assert np.abs(out[0, 0]).max() > 0.0


TINY_MVX = dict(
    voxel_size=(0.4, 0.4, 4.0),
    point_cloud_range=(0., -6.4, -3., 12.8, 6.4, 1.),
    max_voxels_per_sample=512,
    img_backbone_cfg=dict(stage_channels=(8, 16), blocks_per_stage=1),
    img_neck_cfg=dict(out_channels=8),
    fusion_cfg=dict(out_channels=8, img_levels=(4, 8)),
    encoder_cfg=dict(in_channels=12, feat_channels=(16,)),
    backbone_cfg=dict(in_channels=16, out_channels=(16, 32),
                      layer_nums=(1, 1), layer_strides=(2, 2)),
    neck_cfg=dict(in_channels=(16, 32), out_channels=(16, 16),
                  upsample_strides=(1, 2)),
    head_cfg=dict(num_classes=3, num_anchors=6, feat_channels=32),
)

TINY_MVX_HEAD = dict(
    anchor_generator=dict(
        ranges=[[0.2, -6.2, -1.0, 12.6, 6.2, -1.0]] * 3,
        sizes=[[0.8, 0.6, 1.7], [1.8, 0.6, 1.7], [3.9, 1.6, 1.6]],
        rotations=[0.0, 1.57],
    ),
    test_cfg=dict(use_rotate_nms=True, nms_thr=0.5, score_thr=0.05,
                  nms_pre=64, max_num=16),
)


def test_mvx_detector_train_and_predict():
    det = MVXDetector(model_cfg=TINY_MVX, head_cfg=TINY_MVX_HEAD)
    batch = synthetic_mvx_batch(batch_size=2, num_points=512, num_gt=4,
                                img_hw=(32, 64),
                                pc_range=TINY_MVX['point_cloud_range'])
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)

    @jax.jit
    def f(v, b):
        outs, _ = det.apply_train(v, b)
        return det.loss(outs, b)

    total, losses = f(variables, batch)
    assert np.isfinite(float(total)), losses
    for k in ('loss_cls', 'loss_bbox', 'loss_dir'):
        assert any(k in kk for kk in losses), losses.keys()

    grads = jax.jit(jax.grad(
        lambda p: f({'params': p,
                     'batch_stats': variables['batch_stats']}, batch)[0]))(
        variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # image branch actually receives gradient (fusion is live)
    img_g = jax.tree_util.tree_leaves(grads['img_backbone'])
    assert sum(float(jnp.sum(jnp.abs(g))) for g in img_g) > 0

    boxes, scores, labels, valid = jax.jit(
        lambda v, b: det.predict(v, b))(variables, batch)
    assert boxes.shape[0] == 2 and boxes.shape[-1] == 7
    assert np.isfinite(np.asarray(boxes)).all()
