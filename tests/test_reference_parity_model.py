"""MODEL-level parity vs the reference torch code, with transplanted weights.

The BASELINE.json numerics gate asks for "BEV features, losses, per-param
grads allclose vs reference on KITTI frames".  tests/test_reference_parity.py
covers the losses and coders; this file covers the model path:

* ``PillarFeatureNet`` decoration + PFN stack
  (reference ``models/voxel_encoders/pillar_encoder.py:93-158``)
* ``PointVoxelStatsCalculator`` + ``DynamicPillarFeatureNet``
  (``utils.py:7-89``, ``pillar_encoder.py:161-227``)
* SECOND backbone + SECONDFPN neck (upstream modules the reference configs
  instantiate; torch oracles transcribed in tests/torch_oracles.py)
* ``GDAnchor3DHead.loss_single`` (``gd_anchor3d_head.py:62-165``)
* the full trunk end to end: pillars -> BEV canvas -> SECOND -> FPN -> head
  convs -> loss, with per-parameter gradient comparison.

All comparisons run in eval-mode BN (running stats transplanted) — train-mode
BN statistics deviate BY DESIGN (masked statistics, see voxel_encoders.py
module docstring).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from . import ref_loader
from . import torch_oracles as oracles

VOXEL_SIZE = (0.16, 0.16, 4.0)
PCR = (0., -39.68, -3., 69.12, 39.68, 1.)


# --------------------------------------------------------------------- utils
def _rng(seed):
    return np.random.RandomState(seed)


def _rand_bn_stats(rng, c):
    return (rng.randn(c).astype(np.float32) * 0.2,
            rng.uniform(0.5, 2.0, c).astype(np.float32),
            rng.randn(c).astype(np.float32) * 0.5 + 1.0,   # gamma
            rng.randn(c).astype(np.float32) * 0.2)          # beta


def _set_bn(bn, stats):
    mean, var, gamma, beta = stats
    with torch.no_grad():
        bn.running_mean.copy_(torch.tensor(mean))
        bn.running_var.copy_(torch.tensor(var))
        bn.weight.copy_(torch.tensor(gamma))
        bn.bias.copy_(torch.tensor(beta))


def _bn_tree(stats):
    mean, var, gamma, beta = stats
    return ({'scale': gamma, 'bias': beta}, {'mean': mean, 'var': var})


def _hard_pillars(rng, p=40, n=16, c=4):
    """Random padded pillars + coords in MY layout (b, ix, iy, iz)."""
    num_points = rng.randint(1, n + 1, p).astype(np.int32)
    voxels = rng.randn(p, n, c).astype(np.float32)
    voxels[..., 0] = rng.uniform(0, 69, (p, n))
    voxels[..., 1] = rng.uniform(-39, 39, (p, n))
    voxels[..., 2] = rng.uniform(-3, 1, (p, n))
    mask = np.arange(n)[None, :] < num_points[:, None]
    voxels *= mask[..., None]
    coords = np.stack([
        rng.randint(0, 2, p),        # batch
        rng.randint(0, 432, p),      # ix
        rng.randint(0, 496, p),      # iy
        np.zeros(p, np.int64)], -1).astype(np.int32)
    return voxels, coords, num_points


def _to_ref_coords(coords):
    """(b, ix, iy, iz) -> reference (b, iz, iy, ix)."""
    return coords[:, [0, 3, 2, 1]]


# ------------------------------------------------------------ PillarFeatureNet
@pytest.fixture(scope='module')
def ref_encoders():
    penc, utils = ref_loader.load_pillar_encoders()
    return penc, utils


@pytest.mark.parametrize('feat_channels', [(64,), (32, 64)])
def test_pillar_feature_net_parity(ref_encoders, feat_channels):
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.voxel_encoders import PillarFeatureNet

    penc, _ = ref_encoders
    rng = _rng(0)
    voxels, coords, num_points = _hard_pillars(rng)

    ref = penc.PillarFeatureNet(
        in_channels=4, feat_channels=feat_channels, with_distance=False,
        voxel_size=VOXEL_SIZE, point_cloud_range=PCR, legacy=False)
    ref.eval()

    params, stats = {}, {}
    in_ch = 10  # 4 + cluster 3 + voxel-center 3
    for i, (pfn, ch) in enumerate(zip(ref.pfn_layers, feat_channels)):
        units = pfn.units
        w = rng.randn(units, pfn.linear.in_features).astype(np.float32) * 0.1
        with torch.no_grad():
            pfn.linear.weight.copy_(torch.tensor(w))
        bn = _rand_bn_stats(rng, units)
        _set_bn(pfn.norm, bn)
        p_bn, s_bn = _bn_tree(bn)
        params[f'pfn_{i}'] = {'linear': {'kernel': jnp.asarray(w.T)},
                              'norm': p_bn}
        stats[f'pfn_{i}'] = {'norm': s_bn}

    with torch.no_grad():
        out_ref = ref(torch.tensor(voxels), torch.tensor(num_points),
                      torch.tensor(_to_ref_coords(coords))).numpy()

    ours = PillarFeatureNet(in_channels=4, feat_channels=feat_channels,
                            voxel_size=VOXEL_SIZE, point_cloud_range=PCR)
    out = ours.apply(
        {'params': params, 'batch_stats': stats},
        jnp.asarray(voxels), jnp.asarray(coords), jnp.asarray(num_points),
        train=False)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4,
                               atol=1e-5)


# -------------------------------------------- stats calculator + dynamic PFN
def _dyn_points(rng, n=500, b=2):
    pts = np.concatenate([
        rng.uniform(0, 69, (n, 1)), rng.uniform(-39, 39, (n, 1)),
        rng.uniform(-3, 1, (n, 1)), rng.randn(n, 1)], -1).astype(np.float32)
    coords3 = np.stack([
        (pts[:, 0] - PCR[0]) // VOXEL_SIZE[0],
        (pts[:, 1] - PCR[1]) // VOXEL_SIZE[1],
        np.zeros(n)], -1).astype(np.int32)
    coords3[rng.rand(n) < 0.05] = -1            # some invalid points
    batch = rng.randint(0, b, n).astype(np.int32)
    coords4 = np.concatenate([batch[:, None], coords3], -1)
    coords4[coords3[:, 0] < 0] = np.array([-1, -1, -1, -1], np.int32)
    # keep batch id for invalid rows like the pipeline does (batch >= 0)
    coords4[:, 0] = batch
    return pts, coords4


def test_point_voxel_stats_calculator_parity(ref_encoders):
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.voxel_encoders import (
        PointVoxelStatsCalculator)
    from mmdet3d_gaussian_tpu.ops.scatter import build_scatter

    _, utils = ref_encoders
    rng = _rng(1)
    pts, coords4 = _dyn_points(rng)
    valid = (coords4[:, 1:] >= 0).all(-1)

    ref = utils.PointVoxelStatsCalculator(
        voxel_size=VOXEL_SIZE, point_cloud_range=PCR)
    ref_scatter = ref_loader.TorchScatter(
        torch.tensor(_to_ref_coords(coords4)))
    with torch.no_grad():
        out_ref = ref(torch.tensor(pts[:, :3]), ref_scatter).numpy()

    ours = PointVoxelStatsCalculator(voxel_size=VOXEL_SIZE,
                                     point_cloud_range=PCR)
    scatter = build_scatter(jnp.asarray(coords4), (2, 432, 496, 1), 600)
    out = np.asarray(ours.apply({}, jnp.asarray(pts[:, :3]), scatter))

    assert out.shape == out_ref.shape == (len(pts), ref.out_channels)
    # invalid rows differ by design (the reference derives voxel centers
    # from the raw per-point coords even for dropped points); both sides
    # drop those rows before any reduction.
    np.testing.assert_allclose(out[valid], out_ref[valid], rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize('feat_channels', [(64,), (32, 64)])
def test_dynamic_pillar_feature_net_parity(ref_encoders, feat_channels):
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.voxel_encoders import (
        DynamicPillarFeatureNet)
    from mmdet3d_gaussian_tpu.ops.scatter import build_scatter

    penc, _ = ref_encoders
    rng = _rng(2)
    pts, coords4 = _dyn_points(rng)

    ref = penc.DynamicPillarFeatureNet(
        in_channels=4, feat_channels=feat_channels,
        voxel_size=VOXEL_SIZE, point_cloud_range=PCR)
    ref.eval()

    params, stats = {}, {}
    for i, pfn in enumerate(ref.pfn_layers):
        linear, norm = pfn[0], pfn[1]
        w = rng.randn(linear.out_features,
                      linear.in_features).astype(np.float32) * 0.1
        with torch.no_grad():
            linear.weight.copy_(torch.tensor(w))
        bn = _rand_bn_stats(rng, linear.out_features)
        _set_bn(norm, bn)
        p_bn, s_bn = _bn_tree(bn)
        params[f'linear_{i}'] = {'kernel': jnp.asarray(w.T)}
        params[f'norm_{i}'] = p_bn
        stats[f'norm_{i}'] = s_bn

    with torch.no_grad():
        vf_ref, vc_ref = ref(torch.tensor(pts),
                             torch.tensor(_to_ref_coords(coords4)))
    vf_ref, vc_ref = vf_ref.numpy(), vc_ref.numpy()

    max_voxels = 600
    scatter = build_scatter(jnp.asarray(coords4), (2, 432, 496, 1),
                            max_voxels)
    ours = DynamicPillarFeatureNet(in_channels=4,
                                   feat_channels=feat_channels,
                                   voxel_size=VOXEL_SIZE,
                                   point_cloud_range=PCR)
    out = np.asarray(ours.apply({'params': params, 'batch_stats': stats},
                                jnp.asarray(pts), scatter, train=False))
    my_coords = np.asarray(scatter.voxel_coords)
    my_counts = np.asarray(scatter.voxel_counts)

    # align voxel rows by coordinates (row orders differ: ours is sorted on
    # (b, ix, iy, iz), the torch oracle on the reference's (b, iz, iy, ix))
    ref_index = {tuple(c): i for i, c in enumerate(vc_ref[:, [0, 3, 2, 1]])}
    live = my_counts > 0
    assert live.sum() == len(vc_ref)
    for i in np.where(live)[0]:
        j = ref_index[tuple(my_coords[i])]
        np.testing.assert_allclose(out[i], vf_ref[j], rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- SECOND / FPN
def _transplant_second(rng, ref_second, out_channels, layer_nums):
    import jax.numpy as jnp
    params, stats = {}, {}
    for i, block in enumerate(ref_second.blocks):
        convs = [m for m in block if isinstance(m, torch.nn.Conv2d)]
        bns = [m for m in block if isinstance(m, torch.nn.BatchNorm2d)]
        names = [f'stage{i}_down'] + [f'stage{i}_block{j}'
                                      for j in range(layer_nums[i])]
        for name, conv, bn in zip(names, convs, bns):
            w = (rng.randn(*conv.weight.shape).astype(np.float32)
                 * (0.3 / np.sqrt(conv.weight[0].numel())))
            with torch.no_grad():
                conv.weight.copy_(torch.tensor(w))
            bnp = _rand_bn_stats(rng, conv.out_channels)
            _set_bn(bn, bnp)
            p_bn, s_bn = _bn_tree(bnp)
            params[name] = {'conv': {'kernel':
                                     jnp.asarray(w.transpose(2, 3, 1, 0))},
                            'bn': p_bn}
            stats[name] = {'bn': s_bn}
    return params, stats


def _transplant_fpn(rng, ref_fpn, upsample_strides):
    import jax.numpy as jnp
    params, stats = {}, {}
    for i, block in enumerate(ref_fpn.deblocks):
        conv, bn = block[0], block[1]
        w = (rng.randn(*conv.weight.shape).astype(np.float32)
             * (0.3 / np.sqrt(conv.weight[0].numel())))
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(w))
        if isinstance(conv, torch.nn.ConvTranspose2d):
            # torch ConvTranspose2d == flax ConvTranspose with the kernel
            # spatially flipped; torch layout (I, O, kh, kw) -> (kh, kw, I, O)
            k = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
        else:
            k = w.transpose(2, 3, 1, 0)
        bnp = _rand_bn_stats(rng, conv.weight.shape[1]
                             if isinstance(conv, torch.nn.ConvTranspose2d)
                             else conv.weight.shape[0])
        _set_bn(bn, bnp)
        p_bn, s_bn = _bn_tree(bnp)
        params[f'deblock{i}_conv'] = {'kernel': jnp.asarray(k)}
        params[f'deblock{i}_bn'] = p_bn
        stats[f'deblock{i}_bn'] = s_bn
    return params, stats


def test_second_fpn_parity():
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.backbones import SECOND, SECONDFPN

    rng = _rng(3)
    out_channels, layer_nums, strides = (32, 64), (2, 2), (2, 2)
    fpn_out, up_strides = (32, 32), (1, 2)

    ref_b = oracles.TorchSECOND(in_channels=16, out_channels=out_channels,
                                layer_nums=layer_nums, layer_strides=strides)
    ref_n = oracles.TorchSECONDFPN(in_channels=out_channels,
                                   out_channels=fpn_out,
                                   upsample_strides=up_strides)
    ref_b.eval()
    ref_n.eval()
    pb, sb = _transplant_second(rng, ref_b, out_channels, layer_nums)
    pn, sn = _transplant_fpn(rng, ref_n, up_strides)

    x = rng.randn(2, 16, 16, 16).astype(np.float32)  # NCHW
    with torch.no_grad():
        feats_ref = ref_b(torch.tensor(x))
        out_ref = ref_n(feats_ref).numpy()

    ours_b = SECOND(in_channels=16, out_channels=out_channels,
                    layer_nums=layer_nums, layer_strides=strides)
    ours_n = SECONDFPN(in_channels=out_channels, out_channels=fpn_out,
                       upsample_strides=up_strides)
    xh = jnp.asarray(x.transpose(0, 2, 3, 1))
    feats = ours_b.apply({'params': pb, 'batch_stats': sb}, xh, train=False)
    out = ours_n.apply({'params': pn, 'batch_stats': sn}, feats,
                       train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               out_ref, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------- head loss parity
@pytest.fixture(scope='module')
def ref_head_mod():
    gd = ref_loader.load_gd_loss()
    head = ref_loader.load_gd_anchor3d_head(gd)
    return head, gd


def _head_fixture(rng, b=2, h=4, w=4, ncls=3, nrot=2):
    a_cell = nrot
    a = h * w * a_cell
    cls_score = rng.randn(b, h, w, a_cell * ncls).astype(np.float32)
    bbox_pred = (rng.randn(b, h, w, a_cell * 7) * 0.1).astype(np.float32)
    dir_pred = rng.randn(b, h, w, a_cell * 2).astype(np.float32)

    anchors = np.zeros((h, w, 1, nrot, 7), np.float32)
    anchors[..., 0] = rng.uniform(0, 69, (h, w, 1, nrot))
    anchors[..., 1] = rng.uniform(-39, 39, (h, w, 1, nrot))
    anchors[..., 2] = -1.78
    anchors[..., 3:6] = np.array([1.6, 3.9, 1.56])
    anchors[..., 6] = rng.choice([0.0, np.pi / 2], (h, w, 1, nrot))

    labels = np.full((b, a), ncls, np.int64)
    pos = rng.rand(b, a) < 0.15
    labels[pos] = rng.randint(0, ncls, pos.sum())
    bbox_targets = (rng.randn(b, a, 7) * 0.1).astype(np.float32)
    bbox_targets[~pos] = 0
    bbox_weights = pos.astype(np.float32)
    dir_targets = rng.randint(0, 2, (b, a)).astype(np.int64)
    dir_targets[~pos] = 0
    label_weights = np.ones((b, a), np.float32)
    return (cls_score, bbox_pred, dir_pred, anchors, labels, label_weights,
            bbox_targets, bbox_weights, dir_targets, pos)


CASES = [
    (dict(type='GDLoss', loss_type='kld3d', center_offset=(0, 0, 0.5),
          fun='log1p', tau=1.0, alpha=1.0, loss_weight=5.0),
     [0.] * 7, 1.0),
    (dict(type='GDLoss', loss_type='gwd3d', center_offset=(0, 0, 0.5),
          fun='log1p', tau=1.0, alpha=1.0, loss_weight=5.0),
     [0.] * 7, 1.0),
    (dict(type='GDLoss', loss_type='kfiou3d', center_offset=(0, 0, 0.5),
          fun='nlog', tau=0.0, alpha=1.0, loss_weight=5.0),
     [1., 1., 1., 0., 0., 0., 0.], 1.0),
]


@pytest.mark.parametrize('gd_cfg,code_weight,decode_weight', CASES,
                         ids=['kld', 'gwd', 'kfiou'])
def test_gd_anchor3d_head_loss_parity(ref_head_mod, gd_cfg, code_weight,
                                      decode_weight):
    import jax
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.dense_heads.anchor3d_head import (
        AnchorTargets, GDAnchor3DHead)

    head_mod, gd_mod = ref_head_mod
    rng = _rng(4)
    (cls_score, bbox_pred, dir_pred, anchors, labels, label_weights,
     bbox_targets, bbox_weights, dir_targets, pos) = _head_fixture(rng)
    b, h, w = cls_score.shape[:3]
    ncls = 3
    num_pos = int(pos.sum())

    # ---- reference --------------------------------------------------
    ref = ref_loader.make_ref_head(head_mod, gd_mod,
                                   loss_decoded_bbox=dict(gd_cfg),
                                   code_weight=list(code_weight),
                                   decode_weight=decode_weight)
    t_cls = torch.tensor(
        cls_score.transpose(0, 3, 1, 2), requires_grad=True)
    t_reg = torch.tensor(
        bbox_pred.transpose(0, 3, 1, 2), requires_grad=True)
    t_dir = torch.tensor(
        dir_pred.transpose(0, 3, 1, 2), requires_grad=True)
    bw7 = np.repeat(bbox_weights[..., None], 7, axis=-1)
    loss_cls_r, loss_bbox_r, loss_dir_r = ref.loss_single(
        t_cls, t_reg, t_dir,
        torch.tensor(labels), torch.tensor(label_weights),
        torch.tensor(bbox_targets), torch.tensor(bw7.astype(np.float32)),
        torch.tensor(dir_targets), torch.tensor(bbox_weights),
        torch.tensor(anchors.reshape(-1, 7)), float(num_pos))
    total_r = loss_cls_r + loss_bbox_r + loss_dir_r
    total_r.backward()

    # ---- ours --------------------------------------------------------
    ours = GDAnchor3DHead(
        num_classes=ncls,
        anchor_generator=dict(
            ranges=[[0, -39.68, -1.78, 69.12, 39.68, -1.78]],
            sizes=[[1.6, 3.9, 1.56]], rotations=[0, 1.5707963]),
        assigners=[dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45)],
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=2.0),
        loss_decoded_bbox={k: v for k, v in gd_cfg.items() if k != 'type'}
        | {'type': 'GDLoss'},
        loss_dir=dict(type='CrossEntropyLoss', loss_weight=0.2),
        code_weight=list(code_weight), decode_weight=decode_weight)

    targets = AnchorTargets(
        labels=jnp.asarray(labels.astype(np.int32)),
        label_weights=jnp.asarray(label_weights),
        bbox_targets=jnp.asarray(bbox_targets),
        bbox_weights=jnp.asarray(bbox_weights),
        dir_targets=jnp.asarray(dir_targets.astype(np.int32)),
        num_pos=jnp.asarray([pos[i].sum() for i in range(b)], jnp.int32))

    def f(preds):
        losses = ours.loss(preds['cls'], preds['reg'], preds['dir'],
                           jnp.asarray(anchors), targets)
        return (losses['loss_cls'] + losses['loss_bbox']
                + losses['loss_dir'], losses)

    preds = {'cls': jnp.asarray(cls_score), 'reg': jnp.asarray(bbox_pred),
             'dir': jnp.asarray(dir_pred)}
    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(preds)

    np.testing.assert_allclose(float(losses['loss_cls']),
                               float(loss_cls_r.detach()), rtol=1e-4)
    np.testing.assert_allclose(float(losses['loss_bbox']),
                               float(loss_bbox_r.detach()), rtol=2e-4)
    np.testing.assert_allclose(float(losses['loss_dir']),
                               float(loss_dir_r.detach()), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grads['cls']),
        t_cls.grad.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(grads['reg']),
        t_reg.grad.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads['dir']),
        t_dir.grad.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-8)


# ------------------------------------------------- full trunk, params + grads
def test_full_trunk_loss_and_param_grads_parity(ref_encoders, ref_head_mod):
    """pillars -> PFN -> BEV canvas -> SECOND -> FPN -> head convs -> loss,
    reference torch chain vs our flax chain with transplanted weights:
    loss values AND gradients of every parameter must match."""
    import jax
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.backbones import SECOND, SECONDFPN
    from mmdet3d_gaussian_tpu.models.dense_heads.anchor3d_head import (
        Anchor3DHeadConvs, AnchorTargets, GDAnchor3DHead)
    from mmdet3d_gaussian_tpu.models.voxel_encoders import PillarFeatureNet
    from mmdet3d_gaussian_tpu.ops.voxelize import bev_scatter

    penc, _ = ref_encoders
    head_mod, gd_mod = ref_head_mod
    rng = _rng(7)

    b, nx, ny = 2, 16, 16
    ncls, nrot = 3, 2
    p, n = 60, 12
    out_channels, layer_nums, strides = (32, 64), (2, 2), (2, 2)
    fpn_out, up_strides = (32, 32), (1, 2)
    neck_ch = sum(fpn_out)

    # shared pillar inputs; coords within the small canvas
    voxels, coords, num_points = _hard_pillars(rng, p=p, n=n)
    coords[:, 1] = rng.randint(0, nx, p)
    coords[:, 2] = rng.randint(0, ny, p)

    # ---------------- reference torch chain -------------------------
    ref_pfn = penc.PillarFeatureNet(
        in_channels=4, feat_channels=(64,), voxel_size=VOXEL_SIZE,
        point_cloud_range=PCR, legacy=False)
    ref_b = oracles.TorchSECOND(in_channels=64, out_channels=out_channels,
                                layer_nums=layer_nums, layer_strides=strides)
    ref_n = oracles.TorchSECONDFPN(in_channels=out_channels,
                                   out_channels=fpn_out,
                                   upsample_strides=up_strides)
    conv_cls = torch.nn.Conv2d(neck_ch, nrot * ncls, 1)
    conv_reg = torch.nn.Conv2d(neck_ch, nrot * 7, 1)
    conv_dir = torch.nn.Conv2d(neck_ch, nrot * 2, 1)
    for m in (ref_pfn, ref_b, ref_n):
        m.eval()

    # transplant PFN
    params = {'voxel_encoder': {}, 'backbone': {}, 'neck': {},
              'bbox_head': {}}
    stats = {'voxel_encoder': {}, 'backbone': {}, 'neck': {}}
    pfn0 = ref_pfn.pfn_layers[0]
    w = rng.randn(64, 10).astype(np.float32) * 0.1
    with torch.no_grad():
        pfn0.linear.weight.copy_(torch.tensor(w))
    bn = _rand_bn_stats(rng, 64)
    _set_bn(pfn0.norm, bn)
    p_bn, s_bn = _bn_tree(bn)
    params['voxel_encoder']['pfn_0'] = {
        'linear': {'kernel': jnp.asarray(w.T)}, 'norm': p_bn}
    stats['voxel_encoder']['pfn_0'] = {'norm': s_bn}

    pb, sb = _transplant_second(rng, ref_b, out_channels, layer_nums)
    pn, sn = _transplant_fpn(rng, ref_n, up_strides)
    params['backbone'], stats['backbone'] = pb, sb
    params['neck'], stats['neck'] = pn, sn

    for name, conv in (('conv_cls', conv_cls), ('conv_reg', conv_reg),
                       ('conv_dir_cls', conv_dir)):
        wt = rng.randn(*conv.weight.shape).astype(np.float32) * 0.05
        bt = rng.randn(conv.weight.shape[0]).astype(np.float32) * 0.05
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(wt))
            conv.bias.copy_(torch.tensor(bt))
        params['bbox_head'][name] = {
            'kernel': jnp.asarray(wt.transpose(2, 3, 1, 0)),
            'bias': jnp.asarray(bt)}

    # anchors + targets (fixed for both sides); the neck output sits at
    # stride 2 of the canvas -> (ny/2, nx/2) cells
    fh, fw = ny // 2, nx // 2
    (_, _, _, anchors, labels, label_weights, bbox_targets, bbox_weights,
     dir_targets, pos) = _head_fixture(rng, b=b, h=fh, w=fw, ncls=ncls,
                                       nrot=nrot)
    num_pos = int(pos.sum())
    gd_cfg = dict(type='GDLoss', loss_type='kld3d',
                  center_offset=(0, 0, 0.5), fun='log1p', tau=1.0,
                  alpha=1.0, loss_weight=5.0)

    # ---- torch forward + loss --------------------------------------
    t_vox = torch.tensor(voxels)
    pillar_feats_t = ref_pfn(t_vox, torch.tensor(num_points),
                             torch.tensor(_to_ref_coords(coords)))
    # PointPillarsScatter oracle: index_add on flattened (b*ny*nx) rows
    ci = torch.tensor(coords.astype(np.int64))
    lin = (ci[:, 0] * ny + ci[:, 2]) * nx + ci[:, 1]
    flat_canvas = torch.zeros(b * ny * nx, 64)
    flat_canvas = flat_canvas.index_add(0, lin, pillar_feats_t)
    canvas_t = flat_canvas.view(b, ny, nx, 64).permute(0, 3, 1, 2)

    feats_t = ref_n(ref_b(canvas_t))
    cls_t = conv_cls(feats_t)
    reg_t = conv_reg(feats_t)
    dir_t = conv_dir(feats_t)

    ref_head = ref_loader.make_ref_head(head_mod, gd_mod,
                                        loss_decoded_bbox=dict(gd_cfg),
                                        code_weight=[0.] * 7,
                                        decode_weight=1.0)
    bw7 = np.repeat(bbox_weights[..., None], 7, -1).astype(np.float32)
    lc, lb, ld = ref_head.loss_single(
        cls_t, reg_t, dir_t, torch.tensor(labels),
        torch.tensor(label_weights), torch.tensor(bbox_targets),
        torch.tensor(bw7), torch.tensor(dir_targets),
        torch.tensor(bbox_weights), torch.tensor(anchors.reshape(-1, 7)),
        float(num_pos))
    total_t = lc + lb + ld
    total_t.backward()

    # ---- jax forward + loss ----------------------------------------
    enc = PillarFeatureNet(in_channels=4, feat_channels=(64,),
                           voxel_size=VOXEL_SIZE, point_cloud_range=PCR)
    backbone = SECOND(in_channels=64, out_channels=out_channels,
                      layer_nums=layer_nums, layer_strides=strides)
    neck = SECONDFPN(in_channels=out_channels, out_channels=fpn_out,
                     upsample_strides=up_strides)
    head_convs = Anchor3DHeadConvs(num_classes=ncls, num_anchors=nrot,
                                   feat_channels=neck_ch)
    head = GDAnchor3DHead(
        num_classes=ncls,
        anchor_generator=dict(
            ranges=[[0, -39.68, -1.78, 69.12, 39.68, -1.78]],
            sizes=[[1.6, 3.9, 1.56]], rotations=[0, 1.5707963]),
        assigners=[dict(pos_iou_thr=0.6, neg_iou_thr=0.45,
                        min_pos_iou=0.45)],
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                       loss_weight=2.0),
        loss_decoded_bbox=gd_cfg,
        loss_dir=dict(type='CrossEntropyLoss', loss_weight=0.2),
        code_weight=[0.] * 7, decode_weight=1.0)
    targets = AnchorTargets(
        labels=jnp.asarray(labels.astype(np.int32)),
        label_weights=jnp.asarray(label_weights),
        bbox_targets=jnp.asarray(bbox_targets),
        bbox_weights=jnp.asarray(bbox_weights),
        dir_targets=jnp.asarray(dir_targets.astype(np.int32)),
        num_pos=jnp.asarray([pos[i].sum() for i in range(b)], jnp.int32))

    jv = jnp.asarray(voxels)
    jc = jnp.asarray(coords)
    jn = jnp.asarray(num_points)

    def total_loss(prm):
        pf = enc.apply({'params': prm['voxel_encoder'],
                        'batch_stats': stats['voxel_encoder']},
                       jv, jc, jn, train=False)
        canvas = bev_scatter(pf, jc, b, nx, ny)
        f = backbone.apply({'params': prm['backbone'],
                            'batch_stats': stats['backbone']},
                           canvas, train=False)
        f = neck.apply({'params': prm['neck'],
                        'batch_stats': stats['neck']}, f, train=False)
        cls, reg, dirp, _packed = head_convs.apply(
            {'params': prm['bbox_head']}, f)
        losses = head.loss(cls, reg, dirp, jnp.asarray(anchors), targets)
        return (losses['loss_cls'] + losses['loss_bbox']
                + losses['loss_dir'], losses)

    (total, losses), grads = jax.value_and_grad(
        total_loss, has_aux=True)(params)

    np.testing.assert_allclose(float(total), float(total_t.detach()),
                               rtol=2e-4)
    np.testing.assert_allclose(float(losses['loss_cls']),
                               float(lc.detach()), rtol=1e-4)
    np.testing.assert_allclose(float(losses['loss_bbox']),
                               float(lb.detach()), rtol=2e-4)
    np.testing.assert_allclose(float(losses['loss_dir']),
                               float(ld.detach()), rtol=1e-4)

    # ---- per-parameter gradient comparison --------------------------
    def check(jg, tparam, transform, name, rtol=2e-3, atol=2e-6):
        tg = tparam.grad
        assert tg is not None, name
        np.testing.assert_allclose(np.asarray(jg), transform(tg.numpy()),
                                   rtol=rtol, atol=atol, err_msg=name)

    check(grads['voxel_encoder']['pfn_0']['linear']['kernel'],
          pfn0.linear.weight, lambda g: g.T, 'pfn linear')
    check(grads['voxel_encoder']['pfn_0']['norm']['scale'],
          pfn0.norm.weight, lambda g: g, 'pfn bn scale')
    check(grads['voxel_encoder']['pfn_0']['norm']['bias'],
          pfn0.norm.bias, lambda g: g, 'pfn bn bias')

    for i, block in enumerate(ref_b.blocks):
        convs = [m for m in block if isinstance(m, torch.nn.Conv2d)]
        bns = [m for m in block if isinstance(m, torch.nn.BatchNorm2d)]
        names = [f'stage{i}_down'] + [f'stage{i}_block{j}'
                                      for j in range(layer_nums[i])]
        for nm, conv, bnm in zip(names, convs, bns):
            check(grads['backbone'][nm]['conv']['kernel'], conv.weight,
                  lambda g: g.transpose(2, 3, 1, 0), f'backbone {nm} conv')
            check(grads['backbone'][nm]['bn']['scale'], bnm.weight,
                  lambda g: g, f'backbone {nm} bn scale')
            check(grads['backbone'][nm]['bn']['bias'], bnm.bias,
                  lambda g: g, f'backbone {nm} bn bias')

    for i, block in enumerate(ref_n.deblocks):
        conv, bnm = block[0], block[1]
        if isinstance(conv, torch.nn.ConvTranspose2d):
            tr = lambda g: g[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
        else:
            tr = lambda g: g.transpose(2, 3, 1, 0)
        check(grads['neck'][f'deblock{i}_conv']['kernel'], conv.weight, tr,
              f'neck deblock{i}')
        check(grads['neck'][f'deblock{i}_bn']['scale'], bnm.weight,
              lambda g: g, f'neck deblock{i} bn scale')
        check(grads['neck'][f'deblock{i}_bn']['bias'], bnm.bias,
              lambda g: g, f'neck deblock{i} bn bias')

    for nm, conv in (('conv_cls', conv_cls), ('conv_reg', conv_reg),
                     ('conv_dir_cls', conv_dir)):
        check(grads['bbox_head'][nm]['kernel'], conv.weight,
              lambda g: g.transpose(2, 3, 1, 0), f'head {nm} kernel')
        check(grads['bbox_head'][nm]['bias'], conv.bias, lambda g: g,
              f'head {nm} bias')


# ------------------------------------------------------------- centerhead
def test_centerhead_targets_match_reference():
    """CenterHeadRev target building (reference
    ``gd_centerpoint_head.py:65-155``) vs our loop-free heatmap splat +
    padded positive slots: heatmaps allclose, positive (cell, box) sets
    identical."""
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.dense_heads.centerpoint_head import (
        CenterHead as OurCenterHead)

    pc_range = (-25.6, -25.6, -5.0, 25.6, 25.6, 3.0)
    voxel_size = (0.2, 0.2, 8.0)
    factor = 4
    fm = 64                       # 256-cell grid / out_size_factor
    class_names = [['car'], ['pedestrian', 'cyclist']]

    rng = _rng(11)
    g = 12
    # well-inside-range boxes on a jittered grid (unique BEV cells)
    gx = (rng.permutation(fm - 8)[:g] + 4) * 0.8 - 25.6 + rng.rand(g) * 0.3
    gy = (rng.permutation(fm - 8)[:g] + 4) * 0.8 - 25.6 + rng.rand(g) * 0.3
    rows = np.c_[gx, gy, rng.uniform(-2, -1, g),
                 rng.uniform(1.5, 4.5, g), rng.uniform(1.5, 4.5, g),
                 rng.uniform(1.2, 2.0, g),
                 rng.uniform(-3.0, 3.0, g)].astype(np.float32)
    labels = rng.randint(0, 3, g).astype(np.int64)

    # ---- reference
    head_mod = ref_loader.load_gd_centerpoint_head()
    ref_head = ref_loader.make_ref_center_head(
        head_mod, class_names,
        dict(grid_size=[fm * factor, fm * factor, 1],
             point_cloud_range=list(pc_range), voxel_size=list(voxel_size),
             out_size_factor=factor, gaussian_overlap=0.1, min_radius=2))
    heatmaps, anno_boxes, pos_inds = ref_head.get_targets(
        [ref_loader.FakeLiDARBoxes(torch.tensor(rows))],
        [torch.tensor(labels)])

    # ---- ours (padded static shapes)
    pad = 16
    gt = np.zeros((pad, 7), np.float32)
    gt[:g] = rows
    lab = np.zeros((pad,), np.int32)
    lab[:g] = labels
    valid = np.zeros((pad,), bool)
    valid[:g] = True
    our_head = OurCenterHead(
        tasks=[dict(num_classes=len(c)) for c in class_names],
        pc_range=pc_range, voxel_size=voxel_size, out_size_factor=factor,
        max_objs=pad)
    out = our_head.get_targets_single(jnp.asarray(gt), jnp.asarray(lab),
                                      jnp.asarray(valid), (fm, fm))

    for t in range(len(class_names)):
        heat_ref = heatmaps[t][0].numpy()
        heat_our = np.asarray(out[t]['heatmap'], np.float32)
        assert heat_our.shape == heat_ref.shape
        np.testing.assert_allclose(heat_our, heat_ref, atol=3e-5)

        # positives: (x, y, box) sets must match.  Reference anno rows are
        # gravity-z (gravity_center concat); decode ours back to raw boxes.
        mask = np.asarray(out[t]['mask'])
        inds_our = np.asarray(out[t]['inds'])[mask]
        boxes_our = np.asarray(our_head.coder.decode_cells(
            out[t]['anno'], out[t]['inds'][..., 0], out[t]['inds'][..., 1]
        ))[mask]
        boxes_ref = anno_boxes[t].numpy().copy()
        boxes_ref[:, 2] -= boxes_ref[:, 5] * 0.5          # gravity -> bottom
        inds_ref = pos_inds[t][:, 1:].numpy()
        assert len(inds_our) == len(inds_ref)
        o_ord = np.lexsort((inds_our[:, 1], inds_our[:, 0]))
        r_ord = np.lexsort((inds_ref[:, 1], inds_ref[:, 0]))
        np.testing.assert_array_equal(inds_our[o_ord], inds_ref[r_ord])
        np.testing.assert_allclose(boxes_our[o_ord], boxes_ref[r_ord],
                                   rtol=1e-4, atol=1e-5)


def test_centerhead_loss_matches_reference():
    """Full CenterHeadRev.loss parity (reference
    ``gd_centerpoint_head.py:157-200``): same gt + same prediction maps ->
    same per-task heatmap & bbox losses (pins _gather_feat, code_weights,
    avg_factor and coder.encode semantics)."""
    import jax
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.dense_heads.centerpoint_head import (
        CenterHead as OurCenterHead)

    pc_range = (-25.6, -25.6, -5.0, 25.6, 25.6, 3.0)
    voxel_size = (0.2, 0.2, 8.0)
    factor = 4
    fm = 64
    class_names = [['car'], ['pedestrian', 'cyclist']]
    code_weights = [1., 1., 1., 1., 1., 1., 0.8, 0.8]

    rng = _rng(23)
    g = 10
    gx = (rng.permutation(fm - 8)[:g] + 4) * 0.8 - 25.6 + rng.rand(g) * 0.3
    gy = (rng.permutation(fm - 8)[:g] + 4) * 0.8 - 25.6 + rng.rand(g) * 0.3
    rows = np.c_[gx, gy, rng.uniform(-2, -1, g),
                 rng.uniform(1.5, 4.5, g), rng.uniform(1.5, 4.5, g),
                 rng.uniform(1.2, 2.0, g),
                 rng.uniform(-3.0, 3.0, g)].astype(np.float32)
    labels = rng.randint(0, 3, g).astype(np.int64)

    # shared prediction maps, NCHW f32
    preds_np = []
    for cn in class_names:
        preds_np.append(dict(
            heatmap=rng.randn(1, len(cn), fm, fm).astype(np.float32),
            reg=rng.randn(1, 2, fm, fm).astype(np.float32),
            height=rng.randn(1, 1, fm, fm).astype(np.float32),
            dim=(0.3 * rng.randn(1, 3, fm, fm)).astype(np.float32),
            rot=rng.randn(1, 2, fm, fm).astype(np.float32)))

    # ---- reference
    head_mod = ref_loader.load_gd_centerpoint_head()
    coder_mod = ref_loader.load_centerpoint_coder()
    ref_head = ref_loader.make_ref_center_head(
        head_mod, class_names,
        dict(grid_size=[fm * factor, fm * factor, 1],
             point_cloud_range=list(pc_range), voxel_size=list(voxel_size),
             out_size_factor=factor, gaussian_overlap=0.1, min_radius=2,
             code_weights=code_weights))
    ref_head.loss_cls = oracles.TorchGaussianFocalLoss(loss_weight=1.0)
    ref_head.loss_bbox = oracles.TorchL1Loss(loss_weight=0.25)
    ref_head.bbox_coder = coder_mod.CenterPointBBoxCoderRev(
        pc_range=pc_range, out_size_factor=factor, voxel_size=voxel_size)
    ref_preds = [[{k: torch.tensor(v) for k, v in p.items()}]
                 for p in preds_np]
    ref_losses = ref_head.loss(
        [ref_loader.FakeLiDARBoxes(torch.tensor(rows))],
        [torch.tensor(labels)], ref_preds)

    # ---- ours
    pad = 16
    gt = np.zeros((pad, 7), np.float32)
    gt[:g] = rows
    lab = np.zeros((pad,), np.int32)
    lab[:g] = labels
    valid = np.zeros((pad,), bool)
    valid[:g] = True
    our_head = OurCenterHead(
        tasks=[dict(num_classes=len(c)) for c in class_names],
        pc_range=pc_range, voxel_size=voxel_size, out_size_factor=factor,
        max_objs=pad, code_weights=code_weights,
        loss_bbox=dict(type='L1Loss', loss_weight=0.25))
    tgt = our_head.get_targets_single(jnp.asarray(gt), jnp.asarray(lab),
                                      jnp.asarray(valid), (fm, fm))
    tgt_b = jax.tree_util.tree_map(lambda x: x[None], tgt)
    our_preds = [{k: jnp.asarray(np.moveaxis(v, 1, -1))
                  for k, v in p.items()} for p in preds_np]
    our_losses = our_head.loss(our_preds, tgt_b)

    for t in range(len(class_names)):
        np.testing.assert_allclose(
            float(our_losses[f'task{t}.loss_heatmap']),
            float(ref_losses[f'task{t}.loss_heatmap']), rtol=1e-4)
        np.testing.assert_allclose(
            float(our_losses[f'task{t}.loss_bbox']),
            float(ref_losses[f'task{t}.loss_bbox']), rtol=1e-4)


def test_centergd_head_loss_matches_reference():
    """CenterGDHead loss parity (reference ``gd_centerpoint_head.py:389-443``):
    heatmap focal + L1 on (sin dir, cos dir) aux channels + GDLoss on
    decoded raw-yaw boxes, same gt + prediction maps on both sides."""
    import jax
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.dense_heads.centerpoint_head import (
        CenterHead as OurCenterHead)

    pc_range = (-25.6, -25.6, -5.0, 25.6, 25.6, 3.0)
    voxel_size = (0.2, 0.2, 8.0)
    factor = 4
    fm = 64
    class_names = [['car', 'truck']]
    l1_weights = [0.2, 0.2]

    rng = _rng(31)
    g = 8
    gx = (rng.permutation(fm - 8)[:g] + 4) * 0.8 - 25.6 + rng.rand(g) * 0.3
    gy = (rng.permutation(fm - 8)[:g] + 4) * 0.8 - 25.6 + rng.rand(g) * 0.3
    rows = np.c_[gx, gy, rng.uniform(-2, -1, g),
                 rng.uniform(1.5, 4.5, g), rng.uniform(1.5, 4.5, g),
                 rng.uniform(1.2, 2.0, g),
                 rng.uniform(-3.0, 3.0, g)].astype(np.float32)
    labels = rng.randint(0, 2, g).astype(np.int64)

    preds_np = dict(
        heatmap=rng.randn(1, 2, fm, fm).astype(np.float32),
        reg=rng.rand(1, 2, fm, fm).astype(np.float32),
        height=rng.uniform(-2, 0, (1, 1, fm, fm)).astype(np.float32),
        dim=(0.3 * rng.randn(1, 3, fm, fm) + 0.8).astype(np.float32),
        yaw=rng.uniform(-3, 3, (1, 1, fm, fm)).astype(np.float32),
        dir=rng.randn(1, 2, fm, fm).astype(np.float32))

    # ---- reference
    head_mod = ref_loader.load_gd_centerpoint_head()
    yaw_mod = ref_loader.load_centerpoint_yaw_coder()
    gd_mod = ref_loader.load_gd_loss()
    ref_head = ref_loader.make_ref_center_head(
        head_mod, class_names,
        dict(grid_size=[fm * factor, fm * factor, 1],
             point_cloud_range=list(pc_range), voxel_size=list(voxel_size),
             out_size_factor=factor, gaussian_overlap=0.1, min_radius=2,
             code_weights=l1_weights))
    ref_head.__class__ = head_mod.CenterGDHead        # use GD loss/recon
    ref_head.loss_cls = oracles.TorchGaussianFocalLoss(loss_weight=1.0)
    ref_head.loss_bbox = oracles.TorchL1Loss(loss_weight=0.25)
    ref_head.loss_gd = gd_mod.GDLoss(loss_type='kld3d', fun='log1p',
                                     tau=1.0, loss_weight=5.0)
    ref_head.bbox_coder = yaw_mod.CenterPointBBoxYawCoder(
        pc_range=pc_range, out_size_factor=factor, voxel_size=voxel_size)
    ref_losses = ref_head.loss(
        [ref_loader.FakeLiDARBoxes(torch.tensor(rows))],
        [torch.tensor(labels)],
        [[{k: torch.tensor(v) for k, v in preds_np.items()}]])

    # ---- ours (yaw_mode): the reference regresses gravity-z in the height
    # channel and decodes it raw; our decode_cells emits bottom-z and the
    # GD loss re-adds 0.5*dz — identical gravity-center Gaussians.
    pad = 16
    gt = np.zeros((pad, 7), np.float32)
    gt[:g] = rows
    lab = np.zeros((pad,), np.int32)
    lab[:g] = labels
    valid = np.zeros((pad,), bool)
    valid[:g] = True
    our_head = OurCenterHead(
        tasks=[dict(num_classes=2)], pc_range=pc_range,
        voxel_size=voxel_size, out_size_factor=factor, max_objs=pad,
        yaw_mode=True,
        code_weights=[0.] * 7 + l1_weights,
        loss_bbox=dict(type='L1Loss', loss_weight=0.25),
        loss_gd=dict(type='GDLoss', loss_type='kld3d', fun='log1p',
                     tau=1.0, loss_weight=5.0))
    tgt = our_head.get_targets_single(jnp.asarray(gt), jnp.asarray(lab),
                                      jnp.asarray(valid), (fm, fm))
    tgt_b = jax.tree_util.tree_map(lambda x: x[None], tgt)
    our_preds = [{k: jnp.asarray(np.moveaxis(v, 1, -1))
                  for k, v in preds_np.items()}]
    our_losses = our_head.loss(our_preds, tgt_b)

    np.testing.assert_allclose(float(our_losses['task0.loss_heatmap']),
                               float(ref_losses['task0.loss_heatmap']),
                               rtol=1e-4)
    np.testing.assert_allclose(float(our_losses['task0.loss_l1']),
                               float(ref_losses['task0.loss_l1']),
                               rtol=1e-4)
    np.testing.assert_allclose(float(our_losses['task0.loss_gd']),
                               float(ref_losses['task0.loss_gd']),
                               rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------- mvf
def test_mvf_encoder_matches_reference():
    """PillarMVFFeatureNet parity with transplanted weights (reference
    ``pillar_mvf_encoder.py:14-248``): two views (cartesian + cylindrical),
    per-view stats + pointnet -> pillar scatter -> BasicBlock tower with
    deconv fusion -> grid_sample back to points -> pointnet cascade ->
    reduce on view-0 pillars.  Upstream BasicBlock / PointPillarsScatter /
    build_upsample_layer transcribed in tests/torch_oracles.py; grid_sample
    is torch-native on the reference side vs our bilinear_sample_zeros.

    Note: the reference's cross-view invalid masking (forward :217-225) is
    a silent no-op (`coors[flag][:, -3:] = -1` writes into a copy); this
    test keeps every point valid in both views, where intent == actual.
    """
    import math
    import flax
    import jax
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.mvf_encoder import PillarMVFFeatureNet

    fc = 8
    pcr_cart = (0.0, -12.8, -3.0, 25.6, 12.8, 1.0)
    vs_cart = (0.8, 0.8, 4.0)
    pcr_cyl = (-math.pi, -3.0, 0.0, math.pi, 1.0, 80.0)
    vs_cyl = (2 * math.pi / 32, 0.125, 80.0)

    rng = _rng(3)
    b, n = 2, 256
    pts = np.c_[rng.uniform(0.5, 25.0, (b * n, 1)),
                rng.uniform(-12.0, 12.0, (b * n, 1)),
                rng.uniform(-2.5, 0.5, (b * n, 1)),
                rng.rand(b * n, 1)].astype(np.float32)

    mvf_mod = ref_loader.load_pillar_mvf()
    ref = mvf_mod.PillarMVFFeatureNet(
        in_channels=4, feat_channels=fc,
        voxel_size=[vs_cart, vs_cyl],
        point_cloud_range=[list(pcr_cart), list(pcr_cyl)])
    ref.eval()

    def view_coords(vpts, pcr, vs):
        c = np.floor((vpts[:, :3] - np.array(pcr[:3]))
                     / np.array(vs)).astype(np.int64)
        bidx = np.repeat(np.arange(b), n)
        return np.c_[bidx, c[:, 2], c[:, 1], c[:, 0]]      # (b, z, y, x)

    def to_cyl(p):
        phi = np.arctan2(p[:, 1], p[:, 0])
        rho = np.linalg.norm(p[:, :2], axis=-1)
        return np.c_[phi, p[:, 2], rho, p[:, 3:]].astype(np.float32)

    cyl = to_cyl(pts)
    multi_features = [torch.tensor(pts), torch.tensor(cyl)]
    multi_coors = [torch.tensor(view_coords(pts, pcr_cart, vs_cart)),
                   torch.tensor(view_coords(cyl, pcr_cyl, vs_cyl))]

    # ---- randomize reference weights, build our transplanted trees
    params, stats = {}, {}

    def lin_bn(seq, our_fc, our_bn, in_ch):
        w = (rng.randn(fc, in_ch) * 0.2).astype(np.float32)
        with torch.no_grad():
            seq[0].weight.copy_(torch.tensor(w))
        bn = _rand_bn_stats(rng, fc)
        _set_bn(seq[1], bn)
        p, s = _bn_tree(bn)
        params[our_fc] = {'kernel': jnp.asarray(w.T)}
        params[our_bn] = p
        stats[our_bn] = s

    in1 = 1 + 2 * ref.stats_cal[0].out_channels
    lin_bn(ref.pointnet1, 'pointnet1_fc', 'pointnet1_bn', in1)
    lin_bn(ref.pointnet2, 'pointnet2_fc', 'pointnet2_bn', fc)
    lin_bn(ref.pointnet3, 'pointnet3_fc', 'pointnet3_bn', 3 * fc)

    def conv_w(conv, scale=0.2, bias=False):
        w = (rng.randn(*conv.weight.shape) * scale).astype(np.float32)
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(w))
            if bias:
                cout = (conv.weight.shape[1]
                        if isinstance(conv, torch.nn.ConvTranspose2d)
                        else conv.weight.shape[0])
                bt = (rng.randn(cout) * 0.1).astype(np.float32)
                conv.bias.copy_(torch.tensor(bt))
                return w, bt
        return w, None

    def block_tree(block, has_down):
        t_p, t_s = {}, {}
        for nm, conv, bnm in (('conv1', block.conv1, block.bn1),
                              ('conv2', block.conv2, block.bn2)):
            w, _ = conv_w(conv)
            bn = _rand_bn_stats(rng, fc)
            _set_bn(bnm, bn)
            p, s = _bn_tree(bn)
            t_p[nm] = {'kernel': jnp.asarray(w.transpose(2, 3, 1, 0))}
            t_p['bn' + nm[-1]] = p
            t_s['bn' + nm[-1]] = s
        if has_down:
            wd, _ = conv_w(block.downsample[0])
            bnd = _rand_bn_stats(rng, fc)
            _set_bn(block.downsample[1], bnd)
            pd, sd = _bn_tree(bnd)
            t_p['down_conv'] = {'kernel': jnp.asarray(
                wd.transpose(2, 3, 1, 0))}
            t_p['down_bn'] = pd
            t_s['down_bn'] = sd
        return t_p, t_s

    for vi, vname in enumerate(('cartesian', 'cylindrical')):
        vp, vs_tree = {}, {}
        vn = ref.view_nets[vi]
        w = (rng.randn(fc, fc) * 0.2).astype(np.float32)
        with torch.no_grad():
            vn.pointnet[0].weight.copy_(torch.tensor(w))
        bn = _rand_bn_stats(rng, fc)
        _set_bn(vn.pointnet[1], bn)
        p, s = _bn_tree(bn)
        vp['pointnet'] = {'kernel': jnp.asarray(w.T)}
        vp['pointnet_bn'] = p
        vs_tree['pointnet_bn'] = s
        for rname, has_down in (('res1', False), ('res2', True),
                                ('res3', True)):
            bp, bs = block_tree(getattr(vn, rname), has_down)
            vp[rname] = bp
            vs_tree[rname] = bs
        for dname in ('deconv2', 'deconv3'):
            w, _ = conv_w(getattr(vn, dname))
            vp[dname] = {'kernel': jnp.asarray(
                w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())}
        wf, bf = conv_w(vn.conv, bias=True)
        vp['fuse_conv'] = {'kernel': jnp.asarray(wf.transpose(2, 3, 1, 0)),
                           'bias': jnp.asarray(bf)}
        params[f'view_{vname}'] = vp
        stats[f'view_{vname}'] = vs_tree

    with torch.no_grad():
        ref_vox, ref_coors = ref(multi_features, multi_coors)
    ref_vox, ref_coors = ref_vox.numpy(), ref_coors.numpy()

    # ---- ours with the transplanted weights
    enc = PillarMVFFeatureNet(in_channels=4, feat_channels=fc,
                              views=('cartesian', 'cylindrical'),
                              voxel_size=(vs_cart, vs_cyl),
                              point_cloud_range=(pcr_cart, pcr_cyl),
                              max_voxels=1024)
    pts_b = jnp.asarray(pts.reshape(b, n, 4))
    mask_b = jnp.ones((b, n), bool)
    variables = enc.init(jax.random.PRNGKey(0), pts_b, mask_b, train=False)
    var_p = flax.core.unfreeze(variables['params'])
    var_s = flax.core.unfreeze(variables['batch_stats'])

    def deep_update(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                deep_update(dst[k], v)
            else:
                dst[k] = jnp.asarray(v)

    deep_update(var_p, params)
    deep_update(var_s, stats)
    pillar, coords, _ = enc.apply({'params': var_p, 'batch_stats': var_s},
                                  pts_b, mask_b, train=False)
    pillar, coords = np.asarray(pillar), np.asarray(coords)

    live = coords[:, 0] >= 0
    our_rows = {(int(c[0]), int(c[1]), int(c[2])): pillar[r]
                for r, c in enumerate(coords) if live[r]}
    assert len(our_rows) == len(ref_coors)
    for r in range(len(ref_coors)):
        bb, _, y, x = ref_coors[r]
        np.testing.assert_allclose(our_rows[(int(bb), int(x), int(y))],
                                   ref_vox[r], atol=2e-4)
