"""ops/scan: lane-blocked prefix scans vs numpy (== jnp.cumsum / cummax)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdet3d_gaussian_tpu.ops.scan import cummax_i32, cumsum_i32

# ragged lengths around the lane/tile boundaries + the hot-path sizes
LENGTHS = [1, 5, 127, 128, 129, 2048, 2049, 4096, 64001, 65536]


@pytest.mark.parametrize('n', LENGTHS)
def test_cumsum_matches_numpy(n):
    rng = np.random.RandomState(n)
    x = rng.randint(-3, 4, size=n).astype(np.int32)
    got = np.asarray(cumsum_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x).astype(np.int32))


@pytest.mark.parametrize('n', LENGTHS)
def test_cummax_matches_numpy(n):
    rng = np.random.RandomState(n + 7)
    x = rng.randint(-10**6, 10**6, size=n).astype(np.int32)
    got = np.asarray(cummax_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.maximum.accumulate(x))


@pytest.mark.parametrize('n,k,p', [(100, 8, 0.3), (321408, 1024, 0.0005),
                                   (128, 16, 0.0), (129, 4, 1.0),
                                   (6144, 128, 0.01)])
def test_compact_indices(n, k, p):
    from mmdet3d_gaussian_tpu.ops.scan import compact_indices
    rng = np.random.RandomState(n + k)
    mask = rng.rand(n) < p
    idx, valid = jax.jit(compact_indices, static_argnums=1)(
        jnp.asarray(mask), k)
    idx, valid = np.asarray(idx), np.asarray(valid)
    want = np.nonzero(mask)[0][:k]
    assert valid.sum() == len(want)
    np.testing.assert_array_equal(idx[:len(want)], want)
    assert (idx[len(want):] == n - 1).all()


def test_cumsum_zero_one_flags():
    # the build_scatter use: first-flags -> compact segment ids
    rng = np.random.RandomState(0)
    x = (rng.rand(65536) < 0.3).astype(np.int32)
    got = np.asarray(cumsum_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x).astype(np.int32))
