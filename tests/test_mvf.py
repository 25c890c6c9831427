"""MVF multi-view pillar encoder: coordinate views + end-to-end shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.models.mvf_encoder import (PillarMVFFeatureNet,
                                                     to_cylindrical,
                                                     to_spherical)


def test_coordinate_views_roundtrip_magnitudes():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-10, 10, (32, 4)).astype(np.float32))
    cyl = np.asarray(to_cylindrical(pts))
    # rho^2 == x^2+y^2; z preserved; intensity passthrough
    np.testing.assert_allclose(cyl[:, 2] ** 2,
                               np.asarray(pts)[:, 0] ** 2
                               + np.asarray(pts)[:, 1] ** 2, rtol=1e-4)
    np.testing.assert_allclose(cyl[:, 1], np.asarray(pts)[:, 2])
    np.testing.assert_allclose(cyl[:, 3], np.asarray(pts)[:, 3])
    sph = np.asarray(to_spherical(pts))
    np.testing.assert_allclose(
        sph[:, 2], np.linalg.norm(np.asarray(pts)[:, :3], axis=-1),
        rtol=1e-4)


def test_mvf_encoder_end_to_end():
    rng = np.random.RandomState(1)
    pts = np.c_[rng.uniform(-6, 6, (2 * 256, 2)),
                rng.uniform(-1, 1, (2 * 256, 1)),
                rng.rand(2 * 256, 1)].astype(np.float32).reshape(2, 256, 4)
    mask = np.ones((2, 256), bool)
    mask[:, 240:] = False

    enc = PillarMVFFeatureNet(
        in_channels=4, feat_channels=16,
        views=('cartesian', 'cylindrical'),
        voxel_size=((0.75, 0.75, 4.0), (0.3927, 0.25, 10.0)),
        point_cloud_range=((-6, -6, -2, 6, 6, 2),
                           (-3.1416, -2.0, 0.0, 3.1416, 2.0, 10.0)),
        max_voxels=512)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                         jnp.asarray(mask))
    (pillar, coords, (nx, ny)), _ = enc.apply(
        variables, jnp.asarray(pts), jnp.asarray(mask), train=True,
        mutable=['batch_stats'])
    assert pillar.shape == (512, 16)
    assert coords.shape == (512, 4)
    assert (nx, ny) == (16, 16)
    assert np.isfinite(np.asarray(pillar)).all()
    # some pillars active, padded rows zero
    active = np.asarray(coords)[:, 0] >= 0
    assert active.sum() > 10
    np.testing.assert_allclose(np.asarray(pillar)[~active], 0.0, atol=1e-6)
