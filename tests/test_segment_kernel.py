"""Fused sorted-segment Pallas kernel vs the XLA segment-op path.

Runs the kernel through the Pallas interpreter on CPU: Scatter.reduce /
reduce_mapback (values AND gradients, incl. the lowest-index max
tie-break), the stats calculator, and the full DynamicPillarFeatureNet
must match the existing XLA path bit-for-bit-ish (f32 reduction order).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.ops import scatter as sc_mod
from mmdet3d_gaussian_tpu.ops.pallas import segment_kernel as sk
from mmdet3d_gaussian_tpu.ops.scatter import (batch_coords, build_scatter,
                                              compute_voxel_coords)

PCR = (0., -39.68, -3., 69.12, 39.68, 1.)
VSZ = (0.16, 0.16, 4.0)


@pytest.fixture(autouse=True)
def _interpret():
    sk.INTERPRET, old_i = True, sk.INTERPRET
    sk.IMPL, old_m = 'pallas', sk.IMPL
    yield
    sk.INTERPRET, sk.IMPL = old_i, old_m


def _sorted_scatter(seed=0, n=4000, b=2, mv=2048):
    rng = np.random.RandomState(seed)
    pts = np.stack([rng.uniform(-5, 72, n), rng.uniform(-45, 45, n),
                    rng.uniform(-4, 2, n),
                    rng.rand(n)], -1).astype(np.float32)  # some out of range
    coords, _ = compute_voxel_coords(jnp.asarray(pts[:, :3]), PCR, VSZ)
    bidx = jnp.asarray(rng.randint(0, b, n).astype(np.int32))
    c4 = batch_coords(coords, bidx)
    sc = build_scatter(c4, (b, 432, 496, 1), mv, key_order=(0, 2, 1, 3))
    pts_sorted = np.asarray(jnp.take(jnp.asarray(pts), sc.sort_order,
                                     axis=0))
    return sc.sorted_view(), pts_sorted


@pytest.mark.parametrize('op', ['sum', 'mean', 'max'])
def test_reduce_matches_xla(op):
    sv, pts = _sorted_scatter()
    feats = jnp.asarray(np.random.RandomState(1).randn(
        pts.shape[0], 16).astype(np.float32))
    w = jnp.asarray(np.random.RandomState(2).randn(
        sv.max_voxels, 16).astype(np.float32))

    def f(x, use_kernel):
        sk.IMPL = 'pallas' if use_kernel else 'xla'
        return jnp.sum(sv.reduce(x, op) * w)

    v_k, g_k = jax.value_and_grad(lambda x: f(x, True))(feats)
    v_x, g_x = jax.value_and_grad(lambda x: f(x, False))(feats)
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('op', ['sum', 'mean', 'max'])
def test_reduce_mapback_matches_xla(op):
    sv, pts = _sorted_scatter(seed=3)
    feats = jnp.asarray(np.random.RandomState(4).randn(
        pts.shape[0], 8).astype(np.float32))
    w = jnp.asarray(np.random.RandomState(5).randn(
        *feats.shape).astype(np.float32))

    def f(x, use_kernel):
        sk.IMPL = 'pallas' if use_kernel else 'xla'
        return jnp.sum(sv.reduce_mapback(x, op) * w)

    v_k, g_k = jax.value_and_grad(lambda x: f(x, True))(feats)
    v_x, g_x = jax.value_and_grad(lambda x: f(x, False))(feats)
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-4, atol=1e-5)


def test_max_tie_break_lowest_index():
    """Duplicate maxima inside a voxel: gradient to the LOWEST row."""
    sv, pts = _sorted_scatter(seed=6, n=1000, mv=512)
    rng = np.random.RandomState(7)
    feats = rng.randn(1000, 4).astype(np.float32)
    # force ties: quantize hard
    feats = np.round(feats * 2) / 2
    w = jnp.asarray(rng.randn(sv.max_voxels, 4).astype(np.float32))

    def f(x, use_kernel):
        sk.IMPL = 'pallas' if use_kernel else 'xla'
        return jnp.sum(sv.reduce(x, 'max') * w)

    g_k = jax.grad(lambda x: f(x, True))(jnp.asarray(feats))
    g_x = jax.grad(lambda x: f(x, False))(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-5, atol=1e-6)


def test_stats_calculator_matches_xla():
    from mmdet3d_gaussian_tpu.models.voxel_encoders import (
        PointVoxelStatsCalculator)
    sv, pts = _sorted_scatter(seed=8)
    calc = PointVoxelStatsCalculator(
        voxel_size=VSZ, point_cloud_range=PCR,
        with_cluster_center=True, with_cluster_center_offset=True,
        with_covariance=True, with_voxel_center=True,
        with_voxel_point_count=True, with_voxel_center_offset=True)
    xyz = jnp.asarray(pts[:, :3])
    sk.IMPL = 'pallas'
    out_k = calc(xyz, sv)
    sk.IMPL = 'xla'
    out_x = calc(xyz, sv)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)


def test_dynamic_pfn_matches_xla():
    """Full DynamicPillarFeatureNet fwd + grads under both paths."""
    from mmdet3d_gaussian_tpu.models.voxel_encoders import (
        DynamicPillarFeatureNet)
    sv, pts = _sorted_scatter(seed=9, n=2000, mv=1024)
    net = DynamicPillarFeatureNet(in_channels=4, feat_channels=(16, 16),
                                  voxel_size=VSZ, point_cloud_range=PCR)
    x = jnp.asarray(pts)
    sk.IMPL = 'xla'
    params = net.init(jax.random.PRNGKey(0), x, sv, train=False)

    def loss(p, use_kernel):
        sk.IMPL = 'pallas' if use_kernel else 'xla'
        out, _ = net.apply(p, x, sv, train=True, mutable=['batch_stats'])
        return jnp.sum(out ** 2)

    v_k, g_k = jax.value_and_grad(lambda p: loss(p, True))(params)
    v_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(params)
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-4)
    fk = jax.tree_util.tree_leaves(g_k)
    fx = jax.tree_util.tree_leaves(g_x)
    for a, b in zip(fk, fx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
