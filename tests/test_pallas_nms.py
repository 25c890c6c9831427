"""Pallas NMS sweep kernel vs XLA sweep (interpret mode)."""
import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def test_nms_sweep_matches_xla():
    from mmdet3d_gaussian_tpu.ops.pallas.nms_kernel import nms_sweep_pallas
    import jax

    rng = np.random.RandomState(0)
    k = 256
    # random symmetric IoU-like matrix with unit diagonal
    m = rng.rand(k, k).astype(np.float32) * 0.8
    m = (m + m.T) / 2
    np.fill_diagonal(m, 1.0)
    valid = rng.rand(k) > 0.1

    # XLA oracle
    suppress = m > 0.3

    def body(i, keep):
        kill = suppress[i] & (np.arange(k) > i) & keep[i]
        return keep & ~kill

    keep = valid.copy()
    for i in range(k):
        keep = np.asarray(body(i, keep))

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(nms_sweep_pallas(jnp.asarray(m),
                                          jnp.asarray(valid), 0.3))
    np.testing.assert_array_equal(got, keep)
