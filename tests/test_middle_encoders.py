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


def test_vsa_matches_reference():
    """VoxelSetAbstraction parity vs the reference torch source
    (``voxel_set_abstraction.py:94-329``) with transplanted weights: FPS
    keypoints identical; BEV interpolation ('half' align), rawpoint +
    voxel-level MSG set abstraction and the fusion MLP allclose.  The vsa
    CUDA kernels are transcribed torch oracles (ball_query.cu strict d2<r^2,
    first-hit padding; sampling.cu greedy FPS from index 0)."""
    import types
    import flax
    import torch
    from tests import ref_loader
    from tests.test_reference_parity_model import (_rand_bn_stats, _set_bn,
                                                   _bn_tree)
    from mmdet3d_gaussian_tpu.models.middle_encoders import \
        VoxelSetAbstraction
    from mmdet3d_gaussian_tpu.ops.sparse_conv import SparseTensor

    rng = np.random.RandomState(7)
    b, n, m = 2, 600, 64
    vs = (0.1, 0.1, 0.1)
    pcr = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
    c_raw, c_vox, c_bev, out_ch = 1, 16, 16, 32

    pts = np.c_[rng.uniform(1, 15, (b, n, 1)),
                rng.uniform(-7, 7, (b, n, 1)),
                rng.uniform(-2.5, 0.5, (b, n, 1)),
                rng.rand(b, n, c_raw)].astype(np.float32)

    sf = 2
    idx_list = []
    for i in range(b):
        c = np.floor((pts[i, :, :3] - np.array(pcr[:3]))
                     / (np.array(vs) * sf)).astype(np.int64)
        u = np.unique(np.c_[np.full(len(c), i), c[:, 2], c[:, 1], c[:, 0]],
                      axis=0)
        idx_list.append(u)
    vox_idx = np.concatenate(idx_list, 0)
    v = len(vox_idx)
    vox_feats = (rng.randn(v, c_vox) * 0.5).astype(np.float32)
    bev = (rng.randn(b, c_bev, 40, 40) * 0.5).astype(np.float32)

    voxel_sa_cfg = dict(in_channels=c_vox, pool_radius=(1.2, 2.4),
                        samples=(8, 8), mlps=((8, 8), (8, 8)),
                        scale_factor=sf)
    raw_cfg = dict(in_channels=c_raw, pool_radius=(1.2, 2.4),
                   samples=(8, 8), mlps=((8, 8), (8, 8)))
    bev_cfg = dict(in_channels=c_bev, scale_factor=4)

    mod = ref_loader.load_voxel_set_abstraction()
    ns = types.SimpleNamespace
    ref = mod.VoxelSetAbstraction(
        num_keypoints=m, out_channels=out_ch, voxel_size=list(vs),
        point_cloud_range=list(pcr),
        voxel_sa_configs=[ns(**voxel_sa_cfg)],
        rawpoint_sa_config=ns(**raw_cfg), bev_sa_config=ns(**bev_cfg),
        voxel_center_align='half')
    ref.eval()

    params, stats = {}, {}

    def sa_tree(sa_module, our_name, mlps):
        t_p, t_s = {}, {}
        for i, mlp in enumerate(mlps):
            seq = sa_module.mlps[i]
            for j, ch in enumerate(mlp):
                conv, bnm = seq[3 * j], seq[3 * j + 1]
                w = (rng.randn(*conv.weight.shape) * 0.3).astype(np.float32)
                with torch.no_grad():
                    conv.weight.copy_(torch.tensor(w))
                bn = _rand_bn_stats(rng, ch)
                _set_bn(bnm, bn)
                p, s = _bn_tree(bn)
                t_p[f'scale{i}_mlp{j}'] = {
                    'kernel': jnp.asarray(w[:, :, 0].T)}
                t_p[f'scale{i}_bn{j}'] = p
                t_s[f'scale{i}_bn{j}'] = s
        params[our_name], stats[our_name] = t_p, t_s

    sa_tree(ref.rawpoints_sa_layer, 'rawpoints_sa', raw_cfg['mlps'])
    sa_tree(ref.voxel_sa_layers[0], 'voxel_sa_0', voxel_sa_cfg['mlps'])
    wf = (rng.randn(out_ch, ref.vsa_point_feature_fusion[0].in_features)
          * 0.2).astype(np.float32)
    with torch.no_grad():
        ref.vsa_point_feature_fusion[0].weight.copy_(torch.tensor(wf))
    bnf = _rand_bn_stats(rng, out_ch)
    _set_bn(ref.vsa_point_feature_fusion[1], bnf)
    pf, sfb = _bn_tree(bnf)
    params['fusion'] = {'kernel': jnp.asarray(wf.T)}
    params['fusion_bn'], stats['fusion_bn'] = pf, sfb

    class FakeSparse:
        def __init__(self, indices, features):
            self.indices, self.features = indices, features

    with torch.no_grad():
        out_ref = ref(
            [FakeSparse(torch.tensor(vox_idx), torch.tensor(vox_feats))],
            points=[torch.tensor(pts[i]) for i in range(b)],
            coors=None, bev_encode_features=torch.tensor(bev))
    kp_ref = out_ref['keypoints'].numpy()[:, 1:].reshape(b, m, 3)
    fused_ref = out_ref['fusion_keypoint_features'].numpy().reshape(
        b, m, out_ch)
    gathered_ref = out_ref['keypoint_features'].numpy().reshape(b, m, -1)

    vsa = VoxelSetAbstraction(
        num_keypoints=m, out_channels=out_ch, voxel_size=vs,
        point_cloud_range=pcr, voxel_sa_configs=(voxel_sa_cfg,),
        rawpoint_sa_config=raw_cfg, bev_sa_config=bev_cfg,
        voxel_center_align='half')
    keys = (((vox_idx[:, 0] * 40 + vox_idx[:, 1]) * 80 + vox_idx[:, 2]) * 80
            + vox_idx[:, 3]).astype(np.int32)
    order = np.argsort(keys)
    st = SparseTensor(feats=jnp.asarray(vox_feats[order]),
                      coords=jnp.asarray(vox_idx[order].astype(np.int32)),
                      keys=jnp.asarray(keys[order]),
                      spatial_shape=(b, 40, 80, 80),
                      num_voxels=jnp.asarray(v, jnp.int32))
    bev_ours = jnp.asarray(np.moveaxis(bev, 1, -1))
    variables = vsa.init(jax.random.PRNGKey(0), [st], jnp.asarray(pts),
                         jnp.ones((b, n), bool), bev=bev_ours, train=False)
    var_p = flax.core.unfreeze(variables['params'])
    var_s = flax.core.unfreeze(variables['batch_stats'])

    def deep_update(dst, src):
        for k, val in src.items():
            if isinstance(val, dict):
                deep_update(dst[k], val)
            else:
                dst[k] = jnp.asarray(val)

    deep_update(var_p, params)
    deep_update(var_s, stats)
    out = vsa.apply({'params': var_p, 'batch_stats': var_s}, [st],
                    jnp.asarray(pts), jnp.ones((b, n), bool), bev=bev_ours,
                    train=False)
    np.testing.assert_allclose(np.asarray(out['keypoints']), kp_ref,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out['keypoint_features']),
                               gathered_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out['fusion_keypoint_features']),
                               fused_ref, atol=2e-5)
