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


def test_roi_canonical_targets_numpy_oracle():
    """Independent numpy re-derivation of the reference target math
    (``pvrcnn_bbox_head.py:253-317``): canonical rotation, opposite-yaw
    flip, [-pi/2, pi/2] clamp, encode against the zero-centered roi anchor.
    """
    rng = np.random.RandomState(7)
    n = 64
    rois = np.stack([
        rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
        rng.uniform(-2, 0, n), rng.uniform(1, 5, n),
        rng.uniform(1, 3, n), rng.uniform(1, 2, n),
        rng.uniform(-4 * np.pi, 4 * np.pi, n)], -1).astype(np.float32)
    gt = rois + rng.uniform(-0.4, 0.4, (n, 7)).astype(np.float32)
    ious = rng.uniform(0, 1, n).astype(np.float32)

    s = RoISamples(rois=jnp.asarray(rois), roi_labels=jnp.zeros(n, jnp.int32),
                   gt_of_roi=jnp.asarray(gt), ious=jnp.asarray(ious),
                   is_pos=jnp.asarray(ious > 0.55),
                   valid=jnp.ones(n, bool))
    label, label_w, tgt, reg_w = roi_canonical_targets(s, DeltaXYZWLHRBBoxCoder())

    # ---- numpy oracle --------------------------------------------------
    cls_pos, cls_neg = 0.75, 0.25
    lab = (ious > cls_pos).astype(np.float32)
    interval = (ious >= cls_neg) & (ious <= cls_pos)
    lab[interval] = ious[interval] * 2 - 0.5

    roi_ry = rois[:, 6] % (2 * np.pi)
    ct = gt[:, 0:3] - rois[:, 0:3]
    c, si = np.cos(-roi_ry), np.sin(-roi_ry)
    ct_rot = np.stack([c * ct[:, 0] - si * ct[:, 1],
                       si * ct[:, 0] + c * ct[:, 1], ct[:, 2]], -1)
    ry = (gt[:, 6] % (2 * np.pi)) - roi_ry
    ry = ry % (2 * np.pi)
    opp = (ry > np.pi * 0.5) & (ry < np.pi * 1.5)
    ry[opp] = (ry[opp] + np.pi) % (2 * np.pi)
    ry[ry > np.pi] -= 2 * np.pi
    ry = np.clip(ry, -np.pi / 2, np.pi / 2)

    # DeltaXYZWLHR encode vs the zero-centered roi anchor
    wa, la, ha = rois[:, 3], rois[:, 4], rois[:, 5]
    za = ha / 2                        # anchor z lifted by h/2
    diag = np.sqrt(la ** 2 + wa ** 2)
    exp = np.stack([
        ct_rot[:, 0] / diag, ct_rot[:, 1] / diag,
        (ct_rot[:, 2] + gt[:, 5] / 2 - za) / ha,
        np.log(gt[:, 3] / wa), np.log(gt[:, 4] / la),
        np.log(gt[:, 5] / ha), ry], -1)

    np.testing.assert_allclose(np.asarray(label), lab, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt), exp, rtol=2e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(reg_w), (ious > 0.55).astype(np.float32))


def test_sparse_conv_overflow_telemetry():
    """out_capacity too small -> SparseTensor.overflow counts dropped sites."""
    from mmdet3d_gaussian_tpu.ops.sparse_conv import (make_sparse_tensor,
                                                      sparse_conv3d)
    rng = np.random.RandomState(0)
    v = 64
    coords = np.stack([np.zeros(v), rng.randint(0, 8, v),
                       rng.randint(0, 16, v), rng.randint(0, 16, v)],
                      -1).astype(np.int32)
    # dedup coords so the input itself is well-formed
    coords = np.unique(coords, axis=0)
    v = len(coords)
    feats = rng.randn(v, 4).astype(np.float32)
    st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords),
                            (1, 8, 16, 16))
    w = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32) * 0.1)
    out_small = sparse_conv3d(st, w, stride=2, out_capacity=8)
    out_big = sparse_conv3d(st, w, stride=2, out_capacity=512)
    assert int(out_small.overflow) > 0
    assert int(out_big.overflow) == 0


@pytest.mark.slow
def test_pvrcnn_learns():
    """Tiny synthetic cars: loss must descend and a confident detection must
    appear near a gt after a few hundred adam steps (VERDICT r1 next #6)."""
    import optax

    det = PVRCNNDetector(model_cfg=TINY_PVRCNN, rpn_head_cfg=TINY_RPN)
    pcr = TINY_PVRCNN['point_cloud_range']
    rng = np.random.RandomState(0)

    def scene():
        boxes = np.zeros((4, 7), np.float32)
        labels = np.full(4, 2, np.int32)
        valid = np.zeros(4, bool)
        pts = []
        for g in range(2):
            ctr = rng.uniform([3, -4.5, -1.2], [10.5, 4.5, -0.6])
            yaw = rng.choice([0.0, np.pi / 2]) + rng.uniform(-0.1, 0.1)
            dims = np.array([3.9, 1.6, 1.56])
            boxes[g, :3] = ctr - [0, 0, dims[2] / 2]
            boxes[g, 3:6] = dims
            boxes[g, 6] = yaw
            valid[g] = True
            local = rng.uniform(-0.5, 0.5, (160, 3)) * dims
            c, s = np.cos(yaw), np.sin(yaw)
            pts.append(np.stack([
                c * local[:, 0] - s * local[:, 1] + ctr[0],
                s * local[:, 0] + c * local[:, 1] + ctr[1],
                local[:, 2] + ctr[2]], -1))
        bg = rng.uniform([0.2, -6, -1.9], [12.6, 6, -1.6], (192, 3))
        xyz = np.concatenate(pts + [bg], 0)[:512].astype(np.float32)
        inten = rng.rand(512, 1).astype(np.float32)
        return (np.concatenate([xyz, inten], -1), boxes, labels, valid)

    batch = dict(points=[], points_mask=[], gt_bboxes=[], gt_labels=[],
                 gt_valid=[])
    for _ in range(2):
        p, bx, lb, vl = scene()
        batch['points'].append(p)
        batch['points_mask'].append(np.ones(len(p), bool))
        batch['gt_bboxes'].append(bx)
        batch['gt_labels'].append(lb)
        batch['gt_valid'].append(vl)
    batch = {k: jnp.asarray(np.stack(v)) for k, v in batch.items()}

    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)
    params = {'first': variables['first']['params'],
              'second': variables['second']['params']}
    stats = {'first': variables['first']['batch_stats'],
             'second': variables['second']['batch_stats']}
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            v = {'first': {'params': p['first'],
                           'batch_stats': stats['first']},
                 'second': {'params': p['second'],
                            'batch_stats': stats['second']}}
            outs, new_stats = det.apply_train(v, batch)
            total, losses = det.loss(outs, batch)
            return total, (losses, new_stats)
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, total

    # 500 steps: flax BN momentum 0.99 needs ~500 updates before the
    # running averages (used by the eval path) converge to the batch stats
    # the RPN was trained with — at 200 steps train losses are ~0 but eval
    # proposals still collapse (debugged round 2).
    losses = []
    for i in range(500):
        params, stats, opt_state, total = step(params, stats, opt_state)
        if i % 50 == 0:
            losses.append(float(total))
            assert np.isfinite(losses[-1]), (i, losses)
    first, last = losses[0], losses[-1]
    assert last < 0.6 * first, (first, last, losses)

    variables = {'first': {'params': params['first'],
                           'batch_stats': stats['first']},
                 'second': {'params': params['second'],
                            'batch_stats': stats['second']}}
    boxes, scores, labels, valid = jax.jit(det.predict)(variables, batch)
    boxes, scores, valid = (np.asarray(boxes), np.asarray(scores),
                            np.asarray(valid))
    assert valid.any(), 'no detections after training'
    # the best-scoring detection must sit near a gt center of its sample
    flat = np.argmax(np.where(valid, scores, -1))
    bi, di = np.unravel_index(flat, scores.shape)
    gt_ctrs = np.asarray(batch['gt_bboxes'][bi][:2, :2])
    d = np.linalg.norm(gt_ctrs - boxes[bi, di, :2][None], axis=-1).min()
    assert d < 2.0, (d, boxes[bi, di], gt_ctrs)


def test_rpn_class_agnostic_proposals():
    """get_proposals (PartA2RPNHead semantics) must suppress overlapping
    boxes ACROSS classes, unlike get_bboxes' per-class NMS."""
    from mmdet3d_gaussian_tpu.engine.detector import KITTI_3CLASS_HEAD
    from mmdet3d_gaussian_tpu.models.dense_heads.anchor3d_head import \
        GDAnchor3DHead

    hc = dict(KITTI_3CLASS_HEAD)
    hc['anchor_generator'] = dict(
        ranges=[[0., 0., -1., 8., 8., -1.]] * 3,
        sizes=[[3.9, 1.6, 1.56]] * 3, rotations=[0.0, 1.57])
    hc['test_cfg'] = dict(use_rotate_nms=True, nms_thr=0.3, score_thr=0.0,
                          nms_pre=64, max_num=8)
    head = GDAnchor3DHead(**hc)
    anchors = head.anchors_for((2, 2))        # (2, 2, 3, 2, 7)
    h, w, s, r, _ = anchors.shape
    a = s * r
    # logits: one cell strongly predicts class 0 AND class 1 on two anchors
    # at the same location -> same decoded box, different argmax class
    cls = np.full((h, w, a * 3), -10.0, np.float32)
    cls[0, 0, 0 * 3 + 0] = 6.0     # anchor 0 -> class 0, score ~1.0
    cls[0, 0, 2 * 3 + 1] = 4.0     # anchor 2 (same cell) -> class 1
    bbox = np.zeros((h, w, a * 7), np.float32)   # zero deltas: box == anchor
    dirp = np.zeros((h, w, a * 2), np.float32)

    boxes, scores, labels, valid = jax.jit(
        lambda c, b, d: head.get_proposals(c, b, d, anchors))(
        jnp.asarray(cls), jnp.asarray(bbox), jnp.asarray(dirp))
    v = np.asarray(valid)
    lab = np.asarray(labels)[v]
    sc = np.asarray(scores)[v]
    # class-agnostic NMS: the class-1 anchor at the same spot must be gone
    assert (sc > 0.9).sum() == 1
    top = np.asarray(labels)[np.argmax(np.asarray(scores))]
    assert top == 0
    assert not ((lab == 1) & (sc > 0.5)).any()

    # per-class NMS (get_bboxes) keeps BOTH
    b2, s2, l2, v2 = jax.jit(
        lambda c, b, d: head.get_bboxes(c, b, d, anchors))(
        jnp.asarray(cls), jnp.asarray(bbox), jnp.asarray(dirp))
    kept = np.asarray(l2)[np.asarray(v2) & (np.asarray(s2) > 0.5)]
    assert set(kept.tolist()) == {0, 1}


def test_get_bboxes_no_candidate_truncation():
    """All nms_pre candidates must enter per-class NMS: a lower-ranked
    detection hidden behind many duplicates of a stronger object must
    survive (the old min(max_num*2, nms_pre) cap dropped it)."""
    from mmdet3d_gaussian_tpu.engine.detector import KITTI_3CLASS_HEAD
    from mmdet3d_gaussian_tpu.models.dense_heads.anchor3d_head import \
        GDAnchor3DHead

    hc = dict(KITTI_3CLASS_HEAD)
    hc['num_classes'] = 1
    hc['anchor_generator'] = dict(
        ranges=[[0., 0., -1., 40., 4., -1.]],
        sizes=[[3.9, 1.6, 1.56]], rotations=[0.0])
    hc['assigners'] = [dict(pos_iou_thr=0.5, neg_iou_thr=0.35)]
    hc['test_cfg'] = dict(use_rotate_nms=True, nms_thr=0.3, score_thr=0.05,
                          nms_pre=16, max_num=2)
    head = GDAnchor3DHead(**hc)
    anchors = head.anchors_for((1, 10))     # (1, 10, 1, 1, 7): row of anchors
    h, w = 1, 10
    cls = np.full((h, w, 1), -10.0, np.float32)
    bbox = np.zeros((h, w, 7), np.float32)
    # anchors 0..5 all shifted onto the SAME spot (x=0 cell), high scores
    for i in range(6):
        cls[0, i, 0] = 5.0 - 0.1 * i
        bbox[0, i, 0] = (anchors[0, 0, 0, 0, 0] - anchors[0, i, 0, 0, 0]) \
            / np.hypot(anchors[0, i, 0, 0, 3], anchors[0, i, 0, 0, 4])
    # anchor 9: a separate weaker object, rank 7 by score
    cls[0, 9, 0] = 1.0
    dirp = np.zeros((h, w, 2), np.float32)

    boxes, scores, labels, valid = jax.jit(
        lambda c, b, d: head.get_bboxes(c, b, d, anchors))(
        jnp.asarray(cls), jnp.asarray(bbox), jnp.asarray(dirp))
    v = np.asarray(valid)
    kept_x = np.sort(np.round(np.asarray(boxes)[v, 0], 1))
    # two kept detections: the merged strong object and the weak one
    assert v.sum() == 2, (v.sum(), np.asarray(scores))
    assert kept_x[-1] > 30.0  # the far weak object survived


def test_mask_head_targets_match_reference():
    """PointwiseMaskHead target parity vs the reference torch source
    (``pointwise_mask_head.py:62-123``): first-containing-box labels,
    enlarged-box ignore ring, background = num_classes."""
    import torch
    from tests import ref_loader
    from mmdet3d_gaussian_tpu.models.roi_heads import PointwiseMaskHead

    rng = np.random.RandomState(9)
    b, m, g = 2, 128, 5
    kp = rng.uniform(-10, 10, (b, m, 3)).astype(np.float32)
    kp[..., 2] = rng.uniform(-2.2, 0.5, (b, m))
    boxes = np.stack([np.c_[rng.uniform(-8, 8, (g, 2)),
                            rng.uniform(-2, -1.2, (g, 1)),
                            rng.uniform(2, 5, (g, 2)),
                            rng.uniform(1.2, 1.8, (g, 1)),
                            rng.uniform(-3, 3, (g, 1))]
                      for _ in range(b)]).astype(np.float32)
    labels = rng.randint(0, 3, (b, g))

    mod = ref_loader.load_pointwise_mask_head()
    head_ref = mod.PointwiseMaskHead(in_channels=8, num_classes=3,
                                     mlps=(8,), extra_width=0.2,
                                     class_agnostic=True)
    bxyz = torch.tensor(np.c_[np.repeat(np.arange(b), m),
                              kp.reshape(-1, 3)].astype(np.float32))
    tgt_ref = head_ref.get_targets(
        bxyz, [ref_loader.FakePartBoxes(torch.tensor(boxes[i]))
               for i in range(b)],
        [torch.tensor(labels[i]) for i in range(b)])
    ref_seg = tgt_ref['seg_targets'].numpy().reshape(b, m)

    ours = PointwiseMaskHead(num_classes=3, extra_width=0.2)
    our_seg = np.asarray(ours.get_targets(
        jnp.asarray(kp), jnp.asarray(boxes),
        jnp.asarray(labels.astype(np.int32)), jnp.ones((b, g), bool)))
    np.testing.assert_array_equal(our_seg, ref_seg)
    # sanity: the case exercises all three target kinds
    assert (ref_seg == -1).any() and (ref_seg == 3).any() \
        and ((ref_seg >= 0) & (ref_seg < 3)).any()


def test_bbox_head_forward_matches_reference():
    """PVRCNNBboxHead forward parity with transplanted weights (reference
    ``pvrcnn_bbox_head.py:123-138``): shared FC stack -> cls/reg branches,
    eval-mode BN, dropout inactive.  The reference flattens grid features
    channel-major (permute(0,4,1,2,3)); ours grid-major — absorbed into the
    first-layer weight permutation."""
    import torch
    from tests import ref_loader
    from tests.test_reference_parity_model import (_rand_bn_stats, _set_bn,
                                                   _bn_tree)
    from mmdet3d_gaussian_tpu.models.roi_heads import (
        PVRCNNBboxHead as OurHead)

    rng = np.random.RandomState(21)
    b, r, g, c = 2, 8, 6, 16
    g3 = g ** 3
    mod = ref_loader.load_pvrcnn_bbox_head()
    ref = mod.PVRCNNBboxHead(in_channels=c, grid_size=g, num_classes=3,
                             shared_fc=(32, 32), cls_fc=(32,),
                             reg_fc=(32,), dropout=0.3)
    ref.eval()

    feats_grid = (rng.randn(b * r, g, g, g, c) * 0.5).astype(np.float32)

    params, stats = {}, {}

    def seq_tree(seq, names, first_perm=False):
        li = 0
        for name in names:
            conv, bn = seq[li], seq[li + 1]
            w = (rng.randn(*conv.weight.shape) * 0.1).astype(np.float32)
            with torch.no_grad():
                conv.weight.copy_(torch.tensor(w))
            bnst = _rand_bn_stats(rng, conv.weight.shape[0])
            _set_bn(bn, bnst)
            p, s = _bn_tree(bnst)
            k = w[:, :, 0].T                      # (cin, cout)
            if first_perm:
                # ref input rows are ch*g3 + grid; ours grid*c + ch
                perm = np.arange(c * g3).reshape(c, g3).T.reshape(-1)
                k = k[perm]
                first_perm = False
            params[name] = {'kernel': jnp.asarray(k)}
            params[name.replace('shared', 'shared_bn')
                   .replace('cls', 'cls_bn').replace('reg', 'reg_bn')] = p
            stats[name.replace('shared', 'shared_bn')
                  .replace('cls', 'cls_bn').replace('reg', 'reg_bn')] = s
            li += 3
            if isinstance(seq[li] if li < len(seq) else None,
                          torch.nn.Dropout):
                li += 1

    seq_tree(ref.shared_fc_layer, ['shared0', 'shared1'], first_perm=True)
    seq_tree(ref.cls_layers, ['cls0'])
    seq_tree(ref.reg_layers, ['reg0'])
    for conv, name in ((ref.cls_out, 'cls_out'), (ref.reg_out, 'reg_out')):
        w = (rng.randn(*conv.weight.shape) * 0.1).astype(np.float32)
        bt = (rng.randn(conv.weight.shape[0]) * 0.1).astype(np.float32)
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(w))
            conv.bias.copy_(torch.tensor(bt))
        params[name] = {'kernel': jnp.asarray(w[:, :, 0].T),
                        'bias': jnp.asarray(bt)}

    with torch.no_grad():
        cls_ref, reg_ref = ref(torch.tensor(feats_grid))

    ours = OurHead(in_channels=c, grid_size=g, num_classes=3,
                   shared_fc=(32, 32), cls_fc=(32,), reg_fc=(32,),
                   dropout=0.3)
    flat = feats_grid.reshape(b * r, g3, c).reshape(b, r, g3 * c)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(flat),
                          valid=jnp.ones((b, r), bool), train=False)
    import flax
    vp = flax.core.unfreeze(variables['params'])
    vs = flax.core.unfreeze(variables['batch_stats'])

    def deep(dst, src):
        for k2, v in src.items():
            if isinstance(v, dict):
                deep(dst[k2], v)
            else:
                dst[k2] = jnp.asarray(v)

    deep(vp, params)
    deep(vs, stats)
    cls_o, reg_o = ours.apply({'params': vp, 'batch_stats': vs},
                              jnp.asarray(flat),
                              valid=jnp.ones((b, r), bool), train=False)
    np.testing.assert_allclose(np.asarray(cls_o).reshape(-1),
                               cls_ref.numpy().reshape(-1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg_o).reshape(b * r, -1),
                               reg_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_rcnn_loss_assembly_matches_reference():
    """Full second-stage loss parity vs the reference torch source
    (``pvrcnn_bbox_head.py:140-317``) with the PV-RCNN config's loss
    settings (both reductions 'sum', loss_weight 1 —
    ``hv_pvrcnn_secfpn_4x4_80e_kitti-3d-3class.py:166-175``): canonical
    targets, soft-iou BCE, SmoothL1, flip-min Huber corner loss and the
    batch-concatenated weight normalizations all line up."""
    import types
    import torch
    from tests import ref_loader
    from mmdet3d_gaussian_tpu.engine.pvrcnn import PVRCNNDetector
    from mmdet3d_gaussian_tpu.models.roi_heads import (RoISamples,
                                                       roi_canonical_targets)

    rng = np.random.RandomState(13)
    b, r, p = 2, 16, 5

    def mk(rs):
        rois = np.c_[rs.uniform(-10, 10, (r, 2)),
                     rs.uniform(-2, -1, (r, 1)),
                     rs.uniform(2.5, 4.5, (r, 2)),
                     rs.uniform(1.3, 1.8, (r, 1)),
                     rs.uniform(-3, 3, (r, 1))].astype(np.float32)
        gt = rois.copy()
        gt[:, :3] += rs.randn(r, 3) * 0.3
        gt[:, 3:6] *= (1 + rs.randn(r, 3) * 0.1)
        gt[:, 6] += rs.randn(r) * 0.3
        iou = np.zeros(r, np.float32)
        iou[:p] = rs.uniform(0.6, 0.9, p)
        iou[p:] = rs.uniform(0.0, 0.5, r - p)
        return rois, gt, iou

    data = [mk(np.random.RandomState(13 + i)) for i in range(b)]
    cls_pred = rng.randn(b, r, 1).astype(np.float32)
    reg_pred = (rng.randn(b, r, 7) * 0.2).astype(np.float32)

    mod = ref_loader.load_pvrcnn_bbox_head()
    ref = mod.PVRCNNBboxHead(
        in_channels=4, grid_size=2, num_classes=3,
        shared_fc=(8,), cls_fc=(8,), reg_fc=(8,),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                       reduction='sum', loss_weight=1.0),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                      reduction='sum', loss_weight=1.0))
    ref.eval()
    sampling_results = [types.SimpleNamespace(
        pos_bboxes=torch.tensor(rois[:p]),
        pos_gt_bboxes=torch.tensor(gt[:p]),
        iou=torch.tensor(iou)) for rois, gt, iou in data]
    cfg = types.SimpleNamespace(cls_pos_thr=0.75, cls_neg_thr=0.25)
    (label, bbox_targets, pos_gt_bboxes, reg_mask, label_weights,
     bbox_weights) = ref.get_targets(sampling_results, cfg)
    rois_cat = torch.tensor(np.concatenate(
        [np.c_[np.full((r, 1), i), data[i][0]] for i in range(b)]))
    loss_ref = ref.loss(torch.tensor(cls_pred.reshape(b * r, 1)),
                        torch.tensor(reg_pred.reshape(b * r, 7)),
                        rois_cat, label, bbox_targets, pos_gt_bboxes,
                        reg_mask, label_weights, bbox_weights)

    det = PVRCNNDetector()
    samples = RoISamples(
        rois=jnp.asarray(np.stack([d[0] for d in data])),
        roi_labels=jnp.zeros((b, r), jnp.int32),
        gt_of_roi=jnp.asarray(np.stack([d[1] for d in data])),
        ious=jnp.asarray(np.stack([d[2] for d in data])),
        is_pos=jnp.asarray(np.stack([np.arange(r) < p] * b)),
        valid=jnp.ones((b, r), bool))
    losses = det.rcnn_losses(samples, jnp.asarray(cls_pred),
                             jnp.asarray(reg_pred))

    # canonical targets element-exact
    l, _, bt, _ = jax.vmap(
        lambda s: roi_canonical_targets(s, det.roi_coder))(samples)
    np.testing.assert_allclose(np.asarray(l).reshape(-1), label.numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(bt)[:, :p].reshape(-1, 7),
                               bbox_targets.numpy(), atol=2e-5)

    np.testing.assert_allclose(float(losses['loss_roi_cls']),
                               float(loss_ref['loss_cls']), rtol=1e-5)
    np.testing.assert_allclose(float(losses['loss_roi_bbox']),
                               float(loss_ref['loss_bbox']), rtol=1e-5)
    np.testing.assert_allclose(float(losses['loss_corner']),
                               float(loss_ref['loss_corner']), rtol=1e-5)
