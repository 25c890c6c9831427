"""MaxIoU + SimOTA assigner semantics."""
import numpy as np
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.core.bbox.assigners import (MaxIoUAssigner,
                                                      SimOTABEVAssigner,
                                                      bbox_overlaps_nearest_3d)


def test_nearest_iou_identity():
    boxes = jnp.asarray([[5, 5, -1, 4, 2, 1.5, 0.3]])
    iou = np.asarray(bbox_overlaps_nearest_3d(boxes, boxes))
    np.testing.assert_allclose(iou, 1.0, atol=1e-5)


def test_maxiou_assigner_basic():
    gts = jnp.asarray([
        [10.0, 10.0, -1, 4, 2, 1.5, 0.0],
        [30.0, -5.0, -1, 4, 2, 1.5, 0.0]])
    anchors = jnp.asarray([
        [10.0, 10.0, -1, 4, 2, 1.5, 0.0],   # exact match gt0 -> pos
        [10.5, 10.0, -1, 4, 2, 1.5, 0.0],   # high IoU gt0 -> pos
        [30.0, -5.0, -1, 4, 2, 1.5, 0.0],   # exact match gt1 -> pos
        [50.0, 20.0, -1, 4, 2, 1.5, 0.0],   # nothing -> neg
        [11.2, 10.0, -1, 4, 2, 1.5, 0.0],   # IoU 0.538 -> ignore band
    ])
    a = MaxIoUAssigner(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45)
    res = a.assign(anchors, gts, jnp.asarray([2, 2]), jnp.ones(2, bool))
    got = np.asarray(res.assigned_gt)
    assert got[0] == 1 and got[2] == 2
    assert got[1] == 1
    assert got[3] == 0
    # anchor4 IoU with gt0 = 5.6/10.4 = 0.538 in [0.45, 0.6) -> ignore
    assert got[4] == -1
    labels = np.asarray(res.labels)
    assert labels[0] == 2 and labels[3] == -1


def test_maxiou_low_quality_match():
    """A gt whose best anchor IoU is below pos_thr but >= min_pos_iou must
    still claim that anchor (gt-max matching)."""
    gts = jnp.asarray([[10.0, 10.0, -1, 4, 2, 1.5, 0.0]])
    anchors = jnp.asarray([[11.7, 10.0, -1, 4, 2, 1.5, 0.0],
                           [40.0, 0.0, -1, 4, 2, 1.5, 0.0]])
    a = MaxIoUAssigner(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.3)
    res = a.assign(anchors, gts, jnp.asarray([0]), jnp.ones(1, bool))
    assert np.asarray(res.assigned_gt)[0] == 1


def test_maxiou_no_gt():
    anchors = jnp.asarray([[10.0, 10.0, -1, 4, 2, 1.5, 0.0]])
    a = MaxIoUAssigner(pos_iou_thr=0.6, neg_iou_thr=0.45)
    res = a.assign(anchors, jnp.zeros((2, 7)), jnp.zeros(2, jnp.int32),
                   jnp.zeros(2, bool))
    assert np.asarray(res.assigned_gt)[0] == 0   # everything negative


def test_simota_assigns_in_box_priors():
    gt = jnp.asarray([[5.0, 5.0, -1.5, 4.0, 2.0, 1.5, 0.0]])
    # priors on a grid; some inside the gt box
    xs, ys = np.meshgrid(np.arange(0, 10, 1.0), np.arange(0, 10, 1.0))
    priors = np.stack([xs.ravel(), ys.ravel(),
                       np.full(xs.size, 1.0)], -1).astype(np.float32)
    # fake predictions: iou high for priors near the center
    d = np.linalg.norm(priors[:, :2] - np.array([5.0, 5.0]), axis=-1)
    ious = np.clip(1.0 - d / 5.0, 0, 1)[None, :]
    scores = np.full((priors.shape[0], 3), 0.5, np.float32)

    a = SimOTABEVAssigner(center_radius=2.5, candidate_topk=10)
    res = a.assign(jnp.asarray(priors), jnp.asarray(scores),
                   jnp.asarray(ious), gt, jnp.asarray([1]),
                   jnp.ones(1, bool))
    got = np.asarray(res.assigned_gt)
    pos = got > 0
    assert pos.sum() >= 1
    # every positive prior is inside the box AND near the center
    for i in np.where(pos)[0]:
        assert abs(priors[i, 0] - 5.0) <= 2.0 + 1e-5
        assert abs(priors[i, 1] - 5.0) <= 2.5 + 1e-5
    assert (np.asarray(res.labels)[pos] == 1).all()


def test_simota_no_gt():
    priors = jnp.asarray([[1.0, 1.0, 1.0]])
    a = SimOTABEVAssigner()
    res = a.assign(priors, jnp.full((1, 3), 0.5), jnp.zeros((1, 1)),
                   jnp.zeros((1, 7)), jnp.zeros(1, jnp.int32),
                   jnp.zeros(1, bool))
    assert np.asarray(res.assigned_gt)[0] == 0


def test_assign_per_class_vectorized_matches_loop():
    """The vectorized multi-class assignment must equal the per-class
    MaxIoUAssigner loop it replaced (stack in (hw, s, r) order)."""
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.core.bbox.assigners import (
        MaxIoUAssigner, assign_per_class_vectorized)

    rng = np.random.RandomState(11)
    hw, s, r, g = 40, 3, 2, 12
    anchors = np.zeros((hw, s, r, 7), np.float32)
    anchors[..., 0] = rng.uniform(0, 30, (hw, 1, 1))
    anchors[..., 1] = rng.uniform(-10, 10, (hw, 1, 1))
    anchors[..., 3:6] = np.asarray([[3.9, 1.6, 1.56]])
    anchors[..., 6] = np.asarray([0.0, 1.57])[None, None, :]
    gt = np.zeros((g, 7), np.float32)
    gt[:, 0] = rng.uniform(0, 30, g)
    gt[:, 1] = rng.uniform(-10, 10, g)
    gt[:, 3:6] = rng.uniform([1.5, 0.5, 1.3], [4.5, 2.0, 1.8], (g, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, g)
    labels = rng.randint(0, s, g).astype(np.int32)
    valid = rng.rand(g) > 0.2

    assigners = [MaxIoUAssigner(0.5, 0.35, 0.35),
                 MaxIoUAssigner(0.5, 0.35, 0.35),
                 MaxIoUAssigner(0.6, 0.45, 0.45)]

    res_v = assign_per_class_vectorized(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
        jnp.asarray(valid), assigners)

    per = []
    for c, asn in enumerate(assigners):
        anc = anchors[:, c].reshape(-1, 7)
        mask_c = jnp.asarray(valid & (labels == c))
        per.append(asn.assign(jnp.asarray(anc), jnp.asarray(gt),
                              jnp.asarray(labels), mask_c))
    assigned_loop = np.stack(
        [np.asarray(p.assigned_gt).reshape(hw, r) for p in per],
        axis=1).reshape(-1)
    labels_loop = np.stack(
        [np.asarray(p.labels).reshape(hw, r) for p in per],
        axis=1).reshape(-1)

    np.testing.assert_array_equal(np.asarray(res_v.assigned_gt),
                                  assigned_loop)
    np.testing.assert_array_equal(np.asarray(res_v.labels), labels_loop)


def test_sim_ota_matches_reference():
    """SimOTA protocol parity vs the reference torch source
    (``sim_ota_3d_assigner.py:33-211``): same scores / decoded boxes / gts
    -> identical assignment, labels and matched IoUs.  The upstream 3D IoU
    (LiDARInstance3DBoxes.overlaps) is stubbed with our cross-checked numpy
    Sutherland-Hodgman ``iou_3d`` on BOTH sides, so the protocol (global
    candidate set, match_init clamp, dynamic-k, conflict resolution) is
    what's under test."""
    import torch
    from tests import ref_loader
    from mmdet3d_gaussian_tpu.core.evaluation import geometry_np as G

    rng = np.random.RandomState(17)
    A, C, Gn = 240, 3, 6
    # priors on a BEV grid
    xs, ys = np.meshgrid(np.linspace(1, 24, 16), np.linspace(-11, 11, 15))
    centers = np.c_[xs.ravel(), ys.ravel()][:A].astype(np.float32)
    priors = np.c_[centers, np.full((A, 1), 2.0),
                   np.full((A, 1), 2.0)].astype(np.float32)   # (A, 4)
    scores = rng.uniform(0.05, 0.95, (A, C)).astype(np.float32)
    gts = np.c_[rng.uniform(4, 22, (Gn, 1)), rng.uniform(-9, 9, (Gn, 1)),
                rng.uniform(-2, -1, (Gn, 1)),
                rng.uniform(2.5, 5.0, (Gn, 1)),
                rng.uniform(1.5, 2.2, (Gn, 1)),
                rng.uniform(1.3, 1.9, (Gn, 1)),
                rng.uniform(-3, 3, (Gn, 1))].astype(np.float32)
    labels = rng.randint(0, C, Gn)
    # decoded boxes: noisy copies of the nearest gt per prior
    near = np.argmin(np.linalg.norm(
        centers[:, None] - gts[None, :, :2], axis=-1), axis=1)
    dec = gts[near].copy()
    dec[:, :2] = centers + rng.randn(A, 2) * 0.8
    dec[:, 2:6] += rng.randn(A, 4).astype(np.float32) * 0.15
    dec[:, 6] += rng.randn(A).astype(np.float32) * 0.2

    def iou3d_fn(a, b):
        return G.iou_3d(np.asarray(a, np.float64), np.asarray(b, np.float64))

    mod = ref_loader.load_sim_ota(iou3d_fn)
    ref = mod.SimOTABEVAssigner(center_radius=0.5, candidate_topk=10,
                                iou_weight=3.0, cls_weight=1.0,
                                match_init=2.0)
    res_ref = ref.assign(torch.tensor(scores), torch.tensor(dec),
                         torch.tensor(priors), torch.tensor(gts),
                         gt_labels=torch.tensor(labels))

    ours = SimOTABEVAssigner(center_radius=0.5, candidate_topk=10,
                             iou_weight=3.0, cls_weight=1.0, match_init=2.0)
    ious = jnp.asarray(iou3d_fn(dec, gts).T.astype(np.float32))   # (G, A)
    res = ours.assign(jnp.asarray(priors[:, :3]), jnp.asarray(scores),
                      ious, jnp.asarray(gts),
                      jnp.asarray(labels.astype(np.int32)),
                      jnp.ones((Gn,), bool))

    ref_assigned = res_ref.gt_inds.numpy()
    np.testing.assert_array_equal(np.asarray(res.assigned_gt), ref_assigned)
    fg = ref_assigned > 0
    assert fg.sum() > 0
    np.testing.assert_array_equal(np.asarray(res.labels)[fg],
                                  res_ref.labels.numpy()[fg])
    # ALL rows, including the -INF sentinel on unmatched priors
    np.testing.assert_allclose(np.asarray(res.max_overlaps),
                               res_ref.max_overlaps.numpy(), rtol=1e-5)
