"""Learning integration test: the tiny model must actually LEARN.

Synthetic scenes with points concentrated on car-sized boxes + noise; a few
hundred train steps must push the loss down and produce detections that
match GT (the reference's de-facto regression protocol is training-time
evaluation — SURVEY.md §4.2).  Marked slow: ~3-4 min on CPU.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.engine.detector import PointPillarsDetector
from mmdet3d_gaussian_tpu.parallel import train_state as ts
from mmdet3d_gaussian_tpu.core.evaluation.geometry_np import iou_bev

PCR = (0., -12.8, -3., 25.6, 12.8, 1.)

TINY = dict(
    voxel_size=(0.4, 0.4, 4.0),
    point_cloud_range=PCR,
    max_points_per_voxel=16,
    max_voxels_per_sample=1024,
    encoder_cfg=dict(in_channels=4, feat_channels=(32,)),
    backbone_cfg=dict(in_channels=32, out_channels=(32, 64, 128),
                      layer_nums=(1, 1, 1), layer_strides=(2, 2, 2)),
    neck_cfg=dict(in_channels=(32, 64, 128), out_channels=(32, 32, 32),
                  upsample_strides=(1, 2, 4)),
    head_cfg=dict(num_classes=3, num_anchors=6, feat_channels=96),
)
TINY_HEAD = dict(
    # denser positives than the KITTI thresholds: the 0.8 m anchor stride of
    # this tiny canvas leaves the stock 0.6/0.45 Car gate ~1 anchor per gt
    assigners=[
        dict(pos_iou_thr=0.4, neg_iou_thr=0.25, min_pos_iou=0.25),
        dict(pos_iou_thr=0.4, neg_iou_thr=0.25, min_pos_iou=0.25),
        dict(pos_iou_thr=0.45, neg_iou_thr=0.3, min_pos_iou=0.3),
    ],
    test_cfg=dict(use_rotate_nms=True, nms_thr=0.1,
                  score_thr=0.1, nms_pre=256, max_num=16))


def scene(rng, num_points=2048, num_gt=3):
    """Cars with points on them + background clutter."""
    boxes = np.zeros((8, 7), np.float32)
    labels = np.full(8, 2, np.int32)           # class 2 = Car
    valid = np.zeros(8, bool)
    pts = []
    for g in range(num_gt):
        ctr = rng.uniform([4, -9, -1.8], [22, 9, -1.2])
        # near-axis-aligned like real traffic: random yaws leave the
        # nearest-BEV IoU assigner without positive anchors
        yaw = rng.choice([0.0, np.pi / 2]) + rng.uniform(-0.15, 0.15)
        dims = np.array([3.9, 1.6, 1.56])
        boxes[g, :3] = ctr - [0, 0, dims[2] / 2]
        boxes[g, 3:6] = dims
        boxes[g, 6] = yaw
        valid[g] = True
        local = rng.uniform(-0.5, 0.5, (220, 3)) * dims
        c, s = np.cos(yaw), np.sin(yaw)
        world = np.stack([c * local[:, 0] - s * local[:, 1] + ctr[0],
                          s * local[:, 0] + c * local[:, 1] + ctr[1],
                          local[:, 2] + ctr[2]], -1)
        pts.append(world)
    n_bg = num_points - sum(len(p) for p in pts)
    bg = rng.uniform([0, -12.8, -2.5], [25.6, 12.8, -2.2], (n_bg, 3))
    xyz = np.concatenate(pts + [bg], 0)[:num_points].astype(np.float32)
    inten = rng.rand(num_points, 1).astype(np.float32)
    return np.concatenate([xyz, inten], -1), boxes, labels, valid


def make_batch(rng, b=4):
    out = dict(points=[], points_mask=[], gt_bboxes=[], gt_labels=[],
               gt_valid=[])
    for _ in range(b):
        p, bx, lb, vl = scene(rng)
        out['points'].append(p)
        out['points_mask'].append(np.ones(len(p), bool))
        out['gt_bboxes'].append(bx)
        out['gt_labels'].append(lb)
        out['gt_valid'].append(vl)
    return {k: jnp.asarray(np.stack(v)) for k, v in out.items()}


@pytest.mark.slow
def test_model_learns_to_detect():
    rng = np.random.RandomState(0)
    det = PointPillarsDetector(model_cfg=TINY, head_cfg=TINY_HEAD)
    batch0 = make_batch(rng)
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch0)
    opt = ts.make_optimizer(3e-3, total_steps=600,
                            target_ratio=(3.0, 1e-2))
    state = ts.init_state(variables['params'], variables['batch_stats'],
                          opt)
    step = jax.jit(ts.make_train_step(
        lambda v, b, t: det.apply_train(v, b), det.loss, opt))

    first = None
    for i in range(600):
        batch = make_batch(rng)
        state, m = step(state, batch)
        if i == 0:
            first = float(m['loss'])
    last = float(m['loss'])
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)

    # detection quality on fresh scenes
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    test_batch = make_batch(np.random.RandomState(123))
    boxes, scores, labels, valid = jax.jit(det.predict)(variables,
                                                        test_batch)
    boxes, scores = np.asarray(boxes), np.asarray(scores)
    labels, valid = np.asarray(labels), np.asarray(valid)

    matched, total_gt = 0, 0
    for i in range(4):
        gt = np.asarray(test_batch['gt_bboxes'][i])
        gv = np.asarray(test_batch['gt_valid'][i])
        gt = gt[gv]
        total_gt += len(gt)
        det_i = boxes[i][valid[i]]
        if len(det_i) == 0:
            continue
        iou = iou_bev(det_i[:, :7], gt)
        matched += int((iou.max(0) >= 0.3).sum())

    # a tiny model at 600 steps localizes roughly; assert the qualitative
    # signals that distinguish "learning" from "noise": confident detections
    # exist, they are all the right class, and some localize onto GTs
    assert int(valid.sum()) >= 8, int(valid.sum())
    assert (labels[valid] == 2).all(), labels[valid]
    assert matched >= 2, (matched, total_gt)


@pytest.mark.slow
def test_centerpoint_learns_to_detect():
    """CenterPoint family learning check (the anchor-free analogue of the
    PointPillars test above): loss descends and confident detections land
    on GT cars within BEV IoU 0.3."""
    from mmdet3d_gaussian_tpu.engine.detector import CenterPointDetector

    model = dict(
        voxel_size=(0.4, 0.4, 4.0),
        point_cloud_range=PCR,
        max_voxels_per_sample=1024,
        voxelize_mode='dynamic',
        head_type='center',
        encoder_cfg=dict(in_channels=4, feat_channels=(32,)),
        backbone_cfg=dict(in_channels=32, out_channels=(32, 64, 128),
                          layer_nums=(1, 1, 1), layer_strides=(2, 2, 2)),
        neck_cfg=dict(in_channels=(32, 64, 128), out_channels=(32, 32, 32),
                      upsample_strides=(0.5, 1, 2)),
    )
    head = dict(
        tasks=[dict(num_classes=1), dict(num_classes=2)],
        out_size_factor=4,
        with_vel=False,
        code_weights=None,
        max_objs=16,
        test_cfg=dict(max_per_img=16, score_threshold=0.1,
                      nms_type='rotate', nms_thr=0.2, post_max_size=8),
    )
    # task split [1, 2]: class 2 (Car) -> task 1, local id 1
    rng = np.random.RandomState(0)
    det = CenterPointDetector(model_cfg=model, head_cfg=head)
    batch0 = make_batch(rng)
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch0)
    opt = ts.make_optimizer(3e-3, total_steps=600,
                            target_ratio=(3.0, 1e-2))
    state = ts.init_state(variables['params'], variables['batch_stats'],
                          opt)
    step = jax.jit(ts.make_train_step(
        lambda v, b, t: det.apply_train(v, b), det.loss, opt))

    first = None
    for i in range(600):
        batch = make_batch(rng)
        state, m = step(state, batch)
        if i == 0:
            first = float(m['loss'])
    last = float(m['loss'])
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)

    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    test_batch = make_batch(np.random.RandomState(123))
    boxes, scores, labels, valid = jax.jit(det.predict)(variables,
                                                        test_batch)
    boxes, scores = np.asarray(boxes), np.asarray(scores)
    labels, valid = np.asarray(labels), np.asarray(valid)

    matched, total_gt = 0, 0
    for i in range(4):
        gt = np.asarray(test_batch['gt_bboxes'][i])
        gv = np.asarray(test_batch['gt_valid'][i])
        gt = gt[gv]
        total_gt += len(gt)
        det_i = boxes[i][valid[i]]
        if len(det_i) == 0:
            continue
        iou = iou_bev(det_i[:, :7], gt)
        matched += int((iou.max(0) >= 0.3).sum())

    assert int(valid.sum()) >= 4, int(valid.sum())
    assert (labels[valid] == 2).all(), labels[valid]
    assert matched >= 2, (matched, total_gt)
