"""MlvlSparseEncoder + VoxelSetAbstraction on tiny shapes."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.models.middle_encoders import (
    GuidedSAModuleMSG, MlvlSparseEncoder, VoxelSetAbstraction,
    bilinear_sample_bev)


def tiny_voxels(seed=0, v=64, b=2, shape=(24, 16, 16), cin=4):
    rng = np.random.RandomState(seed)
    coords = np.stack([
        rng.randint(0, b, v), rng.randint(0, shape[0], v),
        rng.randint(0, shape[1], v), rng.randint(0, shape[2], v)], -1)
    coords = np.unique(coords, axis=0).astype(np.int32)
    v = len(coords)
    feats = rng.randn(v, cin).astype(np.float32)
    pad = 16
    coords = np.concatenate([coords, -np.ones((pad, 4), np.int32)])
    feats = np.concatenate([feats, np.zeros((pad, cin), np.float32)])
    return jnp.asarray(feats), jnp.asarray(coords), shape


def test_mlvl_sparse_encoder_shapes():
    feats, coords, shape = tiny_voxels()
    enc = MlvlSparseEncoder(in_channels=4, sparse_shape=shape,
                            base_channels=8,
                            encoder_channels=((8,), (16, 16), (16, 16),
                                              (16, 16)),
                            out_channels=16, capacity=128)
    variables = enc.init(jax.random.PRNGKey(0), feats, coords, 2)
    (levels, bev), _ = enc.apply(variables, feats, coords, 2, train=True,
                                 mutable=['batch_stats'])
    assert len(levels) == 4
    # scale factors 1, 2, 4, 8 on (24, 16, 16)
    assert levels[0].spatial_shape == (2, 24, 16, 16)
    assert levels[1].spatial_shape == (2, 12, 8, 8)
    assert levels[3].spatial_shape == (2, 3, 2, 2)
    # pad-0 out conv: z 3 -> (3-3)//2+1 = 1; bev channels = 1*16
    assert bev.shape == (2, 2, 2, 16)
    assert np.isfinite(np.asarray(bev)).all()


def test_bilinear_sample_bev_exact_at_centers():
    h, w, c = 8, 8, 3
    rng = np.random.RandomState(1)
    bev = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    pc_range = (0., 0., -1., 8., 8., 1.)
    cell = (1.0, 1.0)
    # cell centers: (i + 0.5) metric
    xy = jnp.asarray([[0.5, 0.5], [3.5, 5.5]])
    out = np.asarray(bilinear_sample_bev(bev, xy, pc_range, cell))
    np.testing.assert_allclose(out[0], np.asarray(bev)[0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1], np.asarray(bev)[5, 3], atol=1e-5)


def test_guided_sa_module():
    rng = np.random.RandomState(2)
    support = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 4).astype(np.float32))
    query = support[:, :8] + 0.01
    mask = jnp.ones((2, 64), bool)
    sa = GuidedSAModuleMSG(radii=(0.5, 1.0), nsamples=(4, 8),
                           mlps=((8, 8), (8, 16)))
    variables = sa.init(jax.random.PRNGKey(0), support, feats, query, mask)
    out, _ = sa.apply(variables, support, feats, query, mask, True,
                      mutable=['batch_stats'])
    assert out.shape == (2, 8, 24)   # 8 + 16
    assert np.isfinite(np.asarray(out)).all()


def test_voxel_set_abstraction_end_to_end():
    feats, coords, shape = tiny_voxels(seed=3)
    enc = MlvlSparseEncoder(in_channels=4, sparse_shape=shape,
                            base_channels=8,
                            encoder_channels=((8,), (16, 16), (16, 16),
                                              (16, 16)),
                            out_channels=16, capacity=128)
    ev = enc.init(jax.random.PRNGKey(0), feats, coords, 2)
    levels, bev = enc.apply(ev, feats, coords, 2)

    rng = np.random.RandomState(4)
    pts = rng.uniform([0, -1, -1], [2, 1, 1], (2, 256, 3))
    pts = np.concatenate([pts, rng.rand(2, 256, 1)], -1).astype(np.float32)
    mask = np.ones((2, 256), bool)
    mask[:, 200:] = False

    vsa = VoxelSetAbstraction(
        num_keypoints=32, out_channels=32,
        voxel_size=(0.25, 0.25, 0.25),
        point_cloud_range=(0, -2, -1, 4, 2, 1),
        voxel_sa_configs=[
            dict(scale_factor=1, in_channels=8, pool_radius=(0.4,),
                 samples=(8,), mlps=((8, 8),)),
            dict(scale_factor=2, in_channels=16, pool_radius=(0.8,),
                 samples=(8,), mlps=((8, 8),)),
        ],
        rawpoint_sa_config=dict(in_channels=1, pool_radius=(0.4,),
                                samples=(8,), mlps=((8, 8),)),
        bev_sa_config=dict(scale_factor=8, in_channels=bev.shape[-1]))
    variables = vsa.init(jax.random.PRNGKey(1), levels[:2],
                         jnp.asarray(pts), jnp.asarray(mask), bev)
    out, _ = vsa.apply(variables, levels[:2], jnp.asarray(pts),
                       jnp.asarray(mask), bev, True,
                       mutable=['batch_stats'])
    assert out['keypoints'].shape == (2, 32, 3)
    assert out['fusion_keypoint_features'].shape == (2, 32, 32)
    assert np.isfinite(np.asarray(out['fusion_keypoint_features'])).all()
    # keypoints come only from valid points
    kp = np.asarray(out['keypoints'])
    assert kp[:, :, 0].max() <= 2.0 + 1e-5
