"""End-to-end slice: PointPillars + GDLoss full train step (SURVEY.md §7.3).

Reduced-size KITTI-like config on CPU, everything jitted (eager execution of
the full model is pathologically slow on CPU): init, forward, loss, grads,
optimizer steps, NMS predict, and an 8-device sharded step over the virtual
mesh.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.engine.detector import (PointPillarsDetector,
                                                  synthetic_batch)
from mmdet3d_gaussian_tpu.parallel.mesh import make_mesh, shard_batch, use_mesh
from mmdet3d_gaussian_tpu.parallel import train_state as ts


# 64x64 canvas (range 25.6 x 25.6 m / 0.4 m pillars), divisible by 8
TINY_MODEL = dict(
    voxel_size=(0.4, 0.4, 4.0),
    point_cloud_range=(0., -12.8, -3., 25.6, 12.8, 1.),
    max_points_per_voxel=16,
    max_voxels_per_sample=1024,
    encoder_cfg=dict(in_channels=4, feat_channels=(16,)),
    backbone_cfg=dict(in_channels=16, out_channels=(16, 32, 64),
                      layer_nums=(1, 1, 1), layer_strides=(2, 2, 2)),
    neck_cfg=dict(in_channels=(16, 32, 64), out_channels=(16, 16, 16),
                  upsample_strides=(1, 2, 4)),
    head_cfg=dict(num_classes=3, num_anchors=6, feat_channels=48),
)

TINY_HEAD = dict(
    test_cfg=dict(use_rotate_nms=True, nms_thr=0.01, score_thr=0.05,
                  nms_pre=128, max_num=32),
)


@pytest.fixture(scope='module')
def det():
    return PointPillarsDetector(model_cfg=TINY_MODEL, head_cfg=TINY_HEAD)


@pytest.fixture(scope='module')
def batch():
    return synthetic_batch(batch_size=2, num_points=1024, num_gt=8,
                           pc_range=TINY_MODEL['point_cloud_range'])


@pytest.fixture(scope='module')
def variables(det, batch):
    return jax.jit(det.init)(jax.random.PRNGKey(0), batch)


def test_forward_shapes(det, batch, variables):
    (cls, bbox, dirp, _pk), _ = jax.jit(lambda v, b: det.apply_train(v, b))(
        variables, batch)
    h, w = det.featmap_size
    assert (h, w) == (32, 32)
    assert cls.shape == (2, h, w, 6 * 3)
    assert bbox.shape == (2, h, w, 6 * 7)
    assert dirp.shape == (2, h, w, 6 * 2)


def test_loss_and_grads(det, batch, variables):
    @jax.jit
    def f(params):
        outs, _ = det.apply_train(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch)
        return det.loss(outs, batch)

    (total, losses), grads = jax.jit(
        lambda p: jax.value_and_grad(lambda q: f(q), has_aux=True)(p))(
        variables['params'])
    assert np.isfinite(float(total))
    for k in ('loss_cls', 'loss_bbox', 'loss_dir'):
        assert k in losses and np.isfinite(float(losses[k])), k
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in flat)))
    assert gnorm > 0


def test_train_step_descends(det, batch, variables):
    opt = ts.make_optimizer(1e-3, total_steps=100, grad_clip=10.0)
    state = ts.init_state(variables['params'], variables['batch_stats'], opt)

    def apply_fn(vs, b, train):
        return det.apply_train(vs, b)

    step = jax.jit(ts.make_train_step(apply_fn, det.loss, opt))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics['loss']))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 5
    # optimizing the same batch must reduce the loss
    assert losses[-1] < losses[0]


def test_predict_shapes(det, batch, variables):
    boxes, scores, labels, valid = jax.jit(det.predict)(variables, batch)
    assert boxes.shape == (2, 32, 7)
    assert scores.shape == (2, 32)
    assert labels.shape == (2, 32)
    assert valid.dtype == jnp.bool_


def test_sharded_step_8dev(det):
    """Data-parallel step over the 8-device virtual CPU mesh."""
    assert jax.device_count() >= 8, 'conftest must force 8 CPU devices'
    mesh = make_mesh(8, ('data',))
    batch = synthetic_batch(batch_size=8, num_points=512, num_gt=8,
                            pc_range=TINY_MODEL['point_cloud_range'])
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)
    opt = ts.make_optimizer(1e-3, total_steps=10)
    state = ts.init_state(variables['params'], variables['batch_stats'], opt)

    def apply_fn(vs, b, train):
        return det.apply_train(vs, b)

    step = jax.jit(ts.make_train_step(apply_fn, det.loss, opt))
    with use_mesh(mesh):
        sb = shard_batch(mesh, batch)
        state, metrics = step(state, sb)
    assert np.isfinite(float(metrics['loss']))


def test_bf16_mixed_precision(batch):
    """bf16 compute path: loss finite and close to the f32 loss."""
    det16 = PointPillarsDetector(
        model_cfg=dict(TINY_MODEL, compute_dtype='bfloat16'),
        head_cfg=TINY_HEAD)
    v = jax.jit(det16.init)(jax.random.PRNGKey(0), batch)
    outs, _ = jax.jit(lambda vv, b: det16.apply_train(vv, b))(v, batch)
    # head convs keep f32 outputs (f32 params promote); the backbone/neck
    # ran bf16 — verified by the loss deviation tolerance below
    total, losses = jax.jit(
        lambda vv, b: det16.loss(det16.apply_train(vv, b)[0], b))(v, batch)
    assert np.isfinite(float(total))

    det32 = PointPillarsDetector(model_cfg=TINY_MODEL, head_cfg=TINY_HEAD)
    v32 = jax.jit(det32.init)(jax.random.PRNGKey(0), batch)
    t32, _ = jax.jit(
        lambda vv, b: det32.loss(det32.apply_train(vv, b)[0], b))(v32, batch)
    # same init, bf16 vs f32 compute: loss within a few percent
    assert abs(float(total) - float(t32)) / max(abs(float(t32)), 1e-6) < 0.1
