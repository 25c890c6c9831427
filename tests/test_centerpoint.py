"""CenterPoint head family: heatmap targets, losses, decode, e2e tiny model."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.engine.detector import (CenterPointDetector,
                                                  synthetic_batch)
from mmdet3d_gaussian_tpu.ops.heatmap import gaussian_radius, splat_heatmap
from mmdet3d_gaussian_tpu.core.bbox.coders import (CenterPointBBoxCoder,
                                                   CenterPointBBoxYawCoder)


TINY_CP_MODEL = dict(
    voxel_size=(0.4, 0.4, 4.0),
    point_cloud_range=(-12.8, -12.8, -3.0, 12.8, 12.8, 1.0),
    max_voxels_per_sample=1024,
    voxelize_mode='dynamic',
    head_type='center',
    encoder_cfg=dict(in_channels=4, feat_channels=(16,)),
    backbone_cfg=dict(in_channels=16, out_channels=(16, 32, 64),
                      layer_nums=(1, 1, 1), layer_strides=(2, 2, 2)),
    neck_cfg=dict(in_channels=(16, 32, 64), out_channels=(16, 16, 16),
                  upsample_strides=(0.5, 1, 2)),
)

TINY_CP_HEAD = dict(
    tasks=[dict(num_classes=2), dict(num_classes=1)],
    out_size_factor=4,
    with_vel=False,
    code_weights=None,
    max_objs=16,
    test_cfg=dict(max_per_img=32, score_threshold=0.05, nms_type='rotate',
                  nms_thr=0.2, post_max_size=16),
)


def test_gaussian_radius_monotone():
    small = gaussian_radius((jnp.asarray(2.0), jnp.asarray(2.0)), 0.5)
    big = gaussian_radius((jnp.asarray(10.0), jnp.asarray(10.0)), 0.5)
    assert float(big) > float(small) > 0


def test_splat_heatmap_peak_and_extent():
    centers = jnp.asarray([[4, 6], [20, 20]], jnp.int32)
    radius = jnp.asarray([2.0, 3.0])
    cls = jnp.asarray([0, 1], jnp.int32)
    valid = jnp.asarray([True, False])
    hm = splat_heatmap(centers, radius, cls, valid, 2, 32, 32)
    assert hm.shape == (2, 32, 32)
    np.testing.assert_allclose(hm[0, 6, 4], 1.0, atol=1e-6)  # peak at center
    assert float(hm[1].max()) == 0.0                          # invalid object
    # outside radius box -> exactly zero
    assert float(hm[0, 6, 10]) == 0.0
    assert float(hm[0].sum()) > 1.0


def test_centerpoint_coder_roundtrip():
    coder = CenterPointBBoxCoder(pc_range=(-10, -10, -5, 10, 10, 3),
                                 voxel_size=(0.2, 0.2, 8), out_size_factor=2,
                                 code_size=8)
    rng = np.random.RandomState(0)
    boxes = np.c_[rng.uniform(-8, 8, (32, 2)), rng.uniform(-2, 0, (32, 1)),
                  rng.uniform(0.5, 4, (32, 3)),
                  rng.uniform(-np.pi, np.pi, (32, 1))].astype(np.float32)
    ix, iy, codes = coder.encode(jnp.asarray(boxes))
    back = coder.decode_cells(codes, ix, iy)
    got = np.asarray(back)
    np.testing.assert_allclose(got[:, :6], boxes[:, :6], atol=1e-4)
    # yaw equal up to 2pi wrap
    dy = np.abs(np.mod(got[:, 6] - boxes[:, 6] + np.pi, 2 * np.pi) - np.pi)
    np.testing.assert_allclose(dy, 0, atol=1e-4)


def test_yaw_coder_snap():
    coder = CenterPointBBoxYawCoder(pc_range=(-10, -10, -5, 10, 10, 3),
                                    voxel_size=(0.2, 0.2, 8),
                                    out_size_factor=2, code_size=9)
    # box with yaw 0.3 but direction branch says yaw+pi/2 -> snap + w/l swap
    box = jnp.asarray([[1.0, 2.0, -1.0, 2.0, 1.0, 1.5, 0.3]])
    ix, iy, code = coder.encode(box)
    direction = 0.3 + np.pi / 2
    code = code.at[:, 7].set(np.sin(direction)).at[:, 8].set(
        np.cos(direction))
    dec = np.asarray(coder.decode_cells(code, ix, iy, correct_yaw=True))[0]
    np.testing.assert_allclose(dec[6], 0.3 + np.pi / 2, atol=1e-5)
    np.testing.assert_allclose(dec[3], 1.0, atol=1e-5)   # w/l swapped
    np.testing.assert_allclose(dec[4], 2.0, atol=1e-5)


@pytest.fixture(scope='module')
def cp():
    return CenterPointDetector(model_cfg=TINY_CP_MODEL,
                               head_cfg=TINY_CP_HEAD)


@pytest.fixture(scope='module')
def cp_batch():
    b = synthetic_batch(batch_size=2, num_points=1024, num_gt=8,
                        pc_range=TINY_CP_MODEL['point_cloud_range'])
    # labels within 3 classes (2 tasks: [0,1] and [2])
    return b


@pytest.fixture(scope='module')
def cp_vars(cp, cp_batch):
    return jax.jit(cp.init)(jax.random.PRNGKey(0), cp_batch)


def test_cp_forward_shapes(cp, cp_batch, cp_vars):
    preds, _ = jax.jit(lambda v, b: cp.apply_train(v, b))(cp_vars, cp_batch)
    assert len(preds) == 2
    h, w = cp.featmap_size
    assert preds[0]['heatmap'].shape == (2, h, w, 2)
    assert preds[1]['heatmap'].shape == (2, h, w, 1)
    assert preds[0]['reg'].shape == (2, h, w, 2)
    assert preds[0]['dim'].shape == (2, h, w, 3)
    assert preds[0]['rot'].shape == (2, h, w, 2)


def test_cp_loss_and_grad(cp, cp_batch, cp_vars):
    @jax.jit
    def f(params):
        preds, _ = cp.apply_train(
            {'params': params, 'batch_stats': cp_vars['batch_stats']},
            cp_batch)
        return cp.loss(preds, cp_batch)

    (total, losses), grads = jax.jit(
        lambda p: jax.value_and_grad(lambda q: f(q), has_aux=True)(p))(
        cp_vars['params'])
    assert np.isfinite(float(total))
    for t in range(2):
        assert np.isfinite(float(losses[f'task{t}.loss_heatmap']))
        assert np.isfinite(float(losses[f'task{t}.loss_bbox']))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_cp_predict(cp, cp_batch, cp_vars):
    boxes, scores, labels, valid = jax.jit(cp.predict)(cp_vars, cp_batch)
    assert boxes.shape[0] == 2 and boxes.shape[-1] >= 7
    assert scores.shape == labels.shape == valid.shape
    assert np.asarray(labels).max() <= 2  # merged task label offset


def test_cp_gd_yaw_variant():
    head_cfg = dict(TINY_CP_HEAD)
    head_cfg.update(yaw_mode=True,
                    loss_gd=dict(type='GDLoss', loss_type='gwd3d',
                                 fun='log1p', tau=1.0, loss_weight=1.0),
                    code_weights=[1.] * 9)
    cp = CenterPointDetector(model_cfg=TINY_CP_MODEL, head_cfg=head_cfg)
    batch = synthetic_batch(batch_size=2, num_points=512, num_gt=4,
                            pc_range=TINY_CP_MODEL['point_cloud_range'])
    variables = jax.jit(cp.init)(jax.random.PRNGKey(1), batch)

    @jax.jit
    def f(v, b):
        preds, _ = cp.apply_train(v, b)
        return cp.loss(preds, b)

    total, losses = f(variables, batch)
    assert np.isfinite(float(total))
    for t in range(2):
        assert f'task{t}.loss_gd' in losses
        assert np.isfinite(float(losses[f'task{t}.loss_gd']))
