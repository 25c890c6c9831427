"""PV-RCNN two-stage pipeline on tiny shapes: RoI math units + e2e loss."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.core.bbox.coders import DeltaXYZWLHRBBoxCoder
from mmdet3d_gaussian_tpu.models.roi_heads import (RoISamples,
                                                   assign_and_sample,
                                                   corner_loss_lidar,
                                                   decode_roi_boxes,
                                                   roi_canonical_targets)
from mmdet3d_gaussian_tpu.engine.detector import synthetic_batch
from mmdet3d_gaussian_tpu.engine.pvrcnn import PVRCNNDetector


def test_assign_and_sample_ranks_positives_first():
    rng = np.random.RandomState(0)
    gt = np.array([[5, 5, -1, 4, 2, 1.5, 0.0]], np.float32)
    props = np.tile(gt, (8, 1))
    props[:, 0] += np.linspace(0, 6, 8)     # increasing offset -> less IoU
    labels = np.zeros(8, np.int32)
    s = assign_and_sample(jnp.asarray(props), jnp.asarray(labels),
                          jnp.ones(8, bool), jnp.asarray(gt),
                          jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
                          num_samples=8, pos_iou_thr=0.55)
    ious = np.asarray(s.ious)
    assert (np.diff(ious) <= 1e-6).all()    # sorted descending by rank group
    assert bool(s.is_pos[0])
    assert not bool(s.is_pos[-1])


def test_roi_canonical_targets_identity_roi():
    """A proposal exactly equal to its gt must encode to ~zero deltas."""
    coder = DeltaXYZWLHRBBoxCoder()
    box = jnp.asarray([[3.0, -2.0, -1.0, 4.0, 1.8, 1.6, 0.7]])
    s = RoISamples(rois=box, roi_labels=jnp.zeros(1, jnp.int32),
                   gt_of_roi=box, ious=jnp.ones(1),
                   is_pos=jnp.ones(1, bool), valid=jnp.ones(1, bool))
    label, lw, tgt, rw = roi_canonical_targets(s, coder)
    np.testing.assert_allclose(np.asarray(label), 1.0)
    np.testing.assert_allclose(np.asarray(tgt), 0.0, atol=1e-5)

    # decode back: zero deltas -> the roi itself
    dec = decode_roi_boxes(box, jnp.zeros((1, 7)), coder)
    np.testing.assert_allclose(np.asarray(dec)[0], np.asarray(box)[0],
                               atol=1e-5)


def test_corner_loss_zero_for_match_and_flip():
    box = jnp.asarray([[0., 0., 0., 4., 2., 1.5, 0.3]])
    np.testing.assert_allclose(
        np.asarray(corner_loss_lidar(box, box)), 0.0, atol=1e-5)
    flipped = box.at[:, 6].add(np.pi)
    np.testing.assert_allclose(
        np.asarray(corner_loss_lidar(box, flipped)), 0.0, atol=1e-4)


TINY_PVRCNN = dict(
    voxel_size=(0.4, 0.4, 0.1667),
    point_cloud_range=(0., -6.4, -2., 12.8, 6.4, 2.),
    max_voxels=512,
    sparse_shape=(24, 32, 32),
    base_channels=8,
    encoder_channels=((8,), (16, 16), (16, 16), (16, 16)),
    encoder_out_channels=16,
    backbone=dict(in_channels=16, out_channels=(16, 32),
                  layer_nums=(1, 1), layer_strides=(1, 2)),
    neck=dict(in_channels=(16, 32), out_channels=(16, 16),
              upsample_strides=(1, 2)),
    num_keypoints=32,
    vsa_out_channels=32,
    voxel_sa_configs=[
        dict(scale_factor=1, in_channels=8, pool_radius=(0.8,),
             samples=(8,), mlps=((8, 8),)),
        dict(scale_factor=2, in_channels=16, pool_radius=(1.6,),
             samples=(8,), mlps=((8, 8),)),
    ],
    rawpoint_sa_config=dict(in_channels=1, pool_radius=(0.8,),
                            samples=(8,), mlps=((8, 8),)),
    bev_sa=True,
    num_proposals=16,
    grid_size=3,
    roi_pool_radius=(0.8,),
    roi_samples_per_radius=(8,),
    roi_mlps=((16, 16),),
)

TINY_RPN = dict(
    anchor_generator=dict(
        ranges=[[0.2, -6.2, -1.0, 12.6, 6.2, -1.0]] * 3,
        sizes=[[0.8, 0.6, 1.7], [1.8, 0.6, 1.7], [3.9, 1.6, 1.6]],
        rotations=[0.0, 1.57],
    ),
    test_cfg=dict(use_rotate_nms=True, nms_thr=0.8, score_thr=0.0,
                  nms_pre=64, max_num=16),
)


@pytest.mark.slow
def test_pvrcnn_end_to_end_loss_and_grad():
    det = PVRCNNDetector(model_cfg=TINY_PVRCNN, rpn_head_cfg=TINY_RPN)
    batch = synthetic_batch(batch_size=2, num_points=512, num_gt=4,
                            pc_range=TINY_PVRCNN['point_cloud_range'])
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)

    @jax.jit
    def f(v, b):
        outs, _ = det.apply_train(v, b)
        return det.loss(outs, b)

    total, losses = f(variables, batch)
    assert np.isfinite(float(total)), losses
    for k in ('rpn.loss_cls', 'rpn.loss_bbox', 'loss_semantic',
              'loss_roi_cls', 'loss_roi_bbox', 'loss_corner'):
        assert k in losses and np.isfinite(float(losses[k])), k

    @jax.jit
    def g(params):
        v = {'first': {'params': params['first'],
                       'batch_stats': variables['first']['batch_stats']},
             'second': {'params': params['second'],
                        'batch_stats': variables['second']['batch_stats']}}
        outs, _ = det.apply_train(v, batch)
        return det.loss(outs, batch)[0]

    grads = jax.jit(jax.grad(g))({
        'first': variables['first']['params'],
        'second': variables['second']['params']})
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total_norm = float(jnp.sqrt(sum(jnp.sum(x ** 2) for x in leaves)))
    assert total_norm > 0


def test_pvrcnn_predict():
    det = PVRCNNDetector(model_cfg=TINY_PVRCNN, rpn_head_cfg=TINY_RPN)
    batch = synthetic_batch(batch_size=2, num_points=512, num_gt=4,
                            pc_range=TINY_PVRCNN['point_cloud_range'])
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)
    boxes, scores, labels, valid = jax.jit(
        lambda v, b: det.predict(v, b))(variables, batch)
    assert boxes.shape[0] == 2 and boxes.shape[-1] == 7
    assert scores.shape == labels.shape == valid.shape
    assert np.isfinite(np.asarray(boxes)).all()
