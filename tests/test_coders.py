"""Box coder roundtrips + direction targets."""
import numpy as np
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.core.bbox.coders import (DeltaXYZWLHRBBoxCoder,
                                                   add_sin_difference,
                                                   get_direction_target)


def boxes(n, seed):
    rng = np.random.RandomState(seed)
    return np.c_[rng.uniform(-30, 30, (n, 2)), rng.uniform(-2, 0, (n, 1)),
                 rng.uniform(0.5, 4, (n, 3)),
                 rng.uniform(-np.pi, np.pi, (n, 1))].astype(np.float32)


def test_delta_coder_roundtrip():
    coder = DeltaXYZWLHRBBoxCoder()
    anchors = jnp.asarray(boxes(64, 0))
    gt = jnp.asarray(boxes(64, 1))
    deltas = coder.encode(anchors, gt)
    back = coder.decode(anchors, deltas)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4,
                               atol=1e-4)


def test_delta_coder_identity():
    coder = DeltaXYZWLHRBBoxCoder()
    a = jnp.asarray(boxes(16, 2))
    d = np.asarray(coder.encode(a, a))
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_delta_coder_velocity_passthrough():
    coder = DeltaXYZWLHRBBoxCoder(code_size=9)
    a = np.c_[boxes(8, 3), np.zeros((8, 2), np.float32)]
    g = np.c_[boxes(8, 4), np.random.RandomState(5).randn(8, 2)]
    d = coder.encode(jnp.asarray(a), jnp.asarray(g))
    back = np.asarray(coder.decode(jnp.asarray(a), d))
    np.testing.assert_allclose(back, g, rtol=1e-4, atol=1e-4)


def test_sin_difference():
    p = jnp.asarray(boxes(8, 6))
    t = jnp.asarray(boxes(8, 7))
    ps, ts = add_sin_difference(p, t)
    rp = np.asarray(p)[:, 6]
    rt = np.asarray(t)[:, 6]
    np.testing.assert_allclose(np.asarray(ps)[:, 6],
                               np.sin(rp) * np.cos(rt), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ts)[:, 6],
                               np.cos(rp) * np.sin(rt), rtol=1e-5)
    # other channels untouched
    np.testing.assert_allclose(np.asarray(ps)[:, :6], np.asarray(p)[:, :6])


def test_direction_target_bins():
    anchors = jnp.zeros((4, 7))
    # gt yaws: 0, pi/2, pi, -pi/2 with dir_offset=-pi/2:
    # offset_rot = limit(yaw + pi/2, [0, 2pi)) -> pi/2, pi, 3pi/2, 0
    # bin = floor(offset / pi) -> 0, 1, 1, 0
    tgt = jnp.zeros((4, 7)).at[:, 6].set(
        jnp.asarray([0.0, np.pi / 2, np.pi, -np.pi / 2]))
    bins = np.asarray(get_direction_target(anchors, tgt,
                                           dir_offset=-np.pi / 2))
    np.testing.assert_array_equal(bins, [0, 1, 1, 0])


def test_rotation_convention_consistent_across_subsystems():
    """One yaw convention everywhere: box corners from
    ``core.bbox.structures`` (rotation_3d_in_axis / corners_3d) must land on
    the SAME BEV vertices as the eval geometry (``geometry_np``, transcribed
    from the reference ``rbox_utils.hpp:53-71``), and point containment
    (``points_in_boxes_3d``) must agree with polygon membership derived from
    BEV IoU of a tiny probe box."""
    from mmdet3d_gaussian_tpu.core.bbox.structures import (
        corners_3d, points_in_boxes_3d)
    from mmdet3d_gaussian_tpu.core.evaluation import geometry_np as G

    rng = np.random.RandomState(3)
    boxes = np.c_[rng.uniform(-5, 5, (6, 2)), rng.uniform(-2, -1, (6, 1)),
                  rng.uniform(2, 5, (6, 2)), rng.uniform(1, 2, (6, 1)),
                  rng.uniform(-3, 3, (6, 1))].astype(np.float32)

    # corners: our 3D corners' BEV footprint == reference C++ vertex formula
    corners = np.asarray(corners_3d(jnp.asarray(boxes)))     # (N, 8, 3)
    bev_ours = corners[:, :4, :2]                            # one z level
    for i, b in enumerate(boxes):
        x, y, w, h, a = b[0], b[1], b[3], b[4], b[6]
        c2, s2 = np.cos(a) * 0.5, np.sin(a) * 0.5
        p0 = (x - s2 * h - c2 * w, y + c2 * h - s2 * w)
        p1 = (x + s2 * h - c2 * w, y - c2 * h - s2 * w)
        p2 = (2 * x - p0[0], 2 * y - p0[1])
        p3 = (2 * x - p1[0], 2 * y - p1[1])
        ref = {tuple(np.round(p, 4)) for p in (p0, p1, p2, p3)}
        got = {tuple(np.round(p, 4)) for p in bev_ours[i]}
        assert got == ref, (i, got, ref)

    # containment vs polygon membership via a tiny probe box
    pts = np.c_[rng.uniform(-7, 7, (200, 2)),
                rng.uniform(-2.2, -0.8, (200, 1))].astype(np.float32)
    inside = np.asarray(points_in_boxes_3d(jnp.asarray(pts),
                                           jnp.asarray(boxes)))  # (200, 6)
    probes = np.c_[pts[:, :2], np.full((200, 1), -1.6),
                   np.full((200, 2), 1e-3), np.full((200, 1), 2.0),
                   np.zeros((200, 1))]
    bev_in = G.iou_bev(probes.astype(np.float64),
                       boxes.astype(np.float64)) > 0          # (200, 6)
    # exclude points within 2 cm of any box edge (boundary semantics differ
    # legitimately: strict vs probe-area overlap)
    margin = np.zeros_like(bev_in)
    for i, b in enumerate(boxes):
        grown = b.copy(); grown[3:5] += 0.04
        shrunk = b.copy(); shrunk[3:5] -= 0.04
        near_edge = (G.iou_bev(probes, grown[None])[:, 0] > 0) \
            & ~(G.iou_bev(probes, shrunk[None])[:, 0] > 0)
        margin[:, i] = near_edge
    zin = (pts[:, 2:3] >= boxes[None, :, 2]) \
        & (pts[:, 2:3] <= boxes[None, :, 2] + boxes[None, :, 5])
    want = bev_in & zin
    ok = margin | (inside == want)
    assert ok.all(), np.argwhere(~ok)[:5]
