"""Pallas tiled rotated-IoU kernel vs the XLA/NumPy references.

Runs in interpret mode on CPU (pl.pallas_call(interpret=...) via the
force-interpret context); on TPU the same code compiles to Mosaic.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def random_bev_boxes(n, seed):
    rng = np.random.RandomState(seed)
    return np.c_[rng.uniform(-20, 20, (n, 2)), rng.uniform(0.5, 5, (n, 2)),
                 rng.uniform(-np.pi, np.pi, (n, 1))].astype(np.float32)


def test_pallas_iou_matches_reference():
    from jax.experimental.pallas import tpu as pltpu
    from mmdet3d_gaussian_tpu.ops.pallas.rotated_iou_kernel import \
        iou_bev_pallas
    from mmdet3d_gaussian_tpu.core.evaluation import geometry_np as G

    a = random_bev_boxes(40, 0)
    b = random_bev_boxes(30, 1)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(iou_bev_pallas(jnp.asarray(a), jnp.asarray(b)))
    # numpy reference wants 7-dim boxes
    a7 = np.c_[a[:, :2], np.zeros((40, 1)), a[:, 2:4], np.ones((40, 1)),
               a[:, 4:5]].astype(np.float32)
    b7 = np.c_[b[:, :2], np.zeros((30, 1)), b[:, 2:4], np.ones((30, 1)),
               b[:, 4:5]].astype(np.float32)
    want = G.iou_bev(a7, b7)
    np.testing.assert_allclose(got, want, atol=2e-3)
    # self-IoU = 1
    with pltpu.force_tpu_interpret_mode():
        self_iou = np.asarray(iou_bev_pallas(jnp.asarray(a[:8]),
                                             jnp.asarray(a[:8])))
    np.testing.assert_allclose(np.diag(self_iou), 1.0, atol=1e-3)
