"""VSA ops vs NumPy loop oracles: FPS, ball query, grouping."""
import numpy as np
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.ops.vsa import (ball_query, furthest_point_sample,
                                          group_points, query_and_group)


def fps_oracle(pts, k, valid):
    n = len(pts)
    min_d = np.where(valid, 1e10, -1.0)
    first = int(np.argmax(valid))
    idx = [first]
    last = first
    for i in range(1, k):
        d = ((pts - pts[last]) ** 2).sum(-1)
        min_d = np.minimum(min_d, np.where(valid, d, -1.0))
        last = int(np.argmax(min_d))
        idx.append(last)
    return np.asarray(idx)


def test_fps_matches_oracle():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 3).astype(np.float32)
    valid = np.ones(100, bool)
    valid[90:] = False
    got = np.asarray(furthest_point_sample(jnp.asarray(pts), 16,
                                           jnp.asarray(valid)))
    want = fps_oracle(pts, 16, valid)
    np.testing.assert_array_equal(got, want)
    assert (got < 90).all()  # never selects invalid points


def test_fps_spreads():
    # FPS on a line must pick the two endpoints first
    pts = np.zeros((10, 3), np.float32)
    pts[:, 0] = np.arange(10)
    got = np.asarray(furthest_point_sample(jnp.asarray(pts), 3))
    assert got[0] == 0 and got[1] == 9


def test_ball_query_semantics():
    support = np.zeros((6, 3), np.float32)
    support[:, 0] = [0.0, 0.1, 0.2, 5.0, 0.15, 6.0]
    query = np.zeros((2, 3), np.float32)
    query[1, 0] = 100.0  # far away: empty ball
    idx = np.asarray(ball_query(0.5, 3, jnp.asarray(support),
                                jnp.asarray(query)))
    # first 3 in-radius ascending indices: 0, 1, 2
    np.testing.assert_array_equal(idx[0], [0, 1, 2])
    np.testing.assert_array_equal(idx[1], [-1, -1, -1])

    # fewer hits than nsample -> pad with first hit
    idx2 = np.asarray(ball_query(0.12, 3, jnp.asarray(support),
                                 jnp.asarray(query)))
    np.testing.assert_array_equal(idx2[0], [0, 1, 0])


def test_group_points_zero_for_invalid():
    feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    idx = jnp.asarray([[0, 2, -1]], jnp.int32)
    out = np.asarray(group_points(feats, idx))
    np.testing.assert_allclose(out[0, 0], [0, 1, 2])
    np.testing.assert_allclose(out[0, 1], [6, 7, 8])
    np.testing.assert_allclose(out[0, 2], 0.0)


def test_query_and_group():
    rng = np.random.RandomState(1)
    support = rng.randn(50, 3).astype(np.float32)
    feats = rng.randn(50, 4).astype(np.float32)
    query = support[:5] + 0.01
    grouped, idx = query_and_group(1.0, 8, jnp.asarray(support),
                                   jnp.asarray(query), jnp.asarray(feats))
    assert grouped.shape == (5, 8, 7)   # 3 rel-xyz + 4 feats
    g = np.asarray(grouped)
    i = np.asarray(idx)
    # relative coords of real hits are within radius
    norms = np.linalg.norm(g[..., :3], axis=-1)
    assert (norms[i >= 0] <= 1.0 + 1e-5).all()
