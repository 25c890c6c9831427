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
