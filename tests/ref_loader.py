"""Load REFERENCE torch modules from /root/reference with mm* stubbed.

The reference files import mmcv/mmdet/mmdet3d, which are not installed.  We
register stub modules providing exactly the symbols those files touch (the
upstream pieces come from tests/torch_oracles.py), then exec the reference
source files inside a fake package so their relative imports resolve.

Used by tests/test_reference_parity_model.py to run the reference's
``PillarFeatureNet`` / ``DynamicPillarFeatureNet`` / ``PointVoxelStatsCalculator``
(``models/voxel_encoders/{pillar_encoder,utils}.py``) and
``GDAnchor3DHead.loss_single`` (``models/dense_heads/gd_anchor3d_head.py``)
on CPU against our JAX implementations with transplanted weights.
"""
import contextlib
import functools
import importlib.util
import sys
import types

import torch
from torch import nn

from . import torch_oracles as oracles

REF_ROOT = '/root/reference/mmdet3d_gaussian'


class _NoopRegistry:
    @staticmethod
    def register_module(*a, **k):
        def deco(cls):
            return cls
        if a and isinstance(a[0], type):   # bare @register_module usage
            return a[0]
        return deco


def _noop_decorator_factory(*a, **k):
    """mmcv.runner.force_fp32 / auto_fp16 (decorator factories)."""
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            return fn(*args, **kwargs)
        return wrapper
    return deco


class TorchScatter:
    """CPU torch oracle of the reference ``Scatter``
    (``ops/voxel/scatter.py:75-144``): per-sample ``unique_dim`` dedup with
    the invalid (-1) row stripped, reduce/mapback/reduce_mapback.

    Row order note: the CUDA ``at::unique_dim`` used by the reference does
    not document order; we use sorted unique per sample, batch-major — the
    same compact order our JAX ``build_scatter`` produces, so voxel rows
    align for parity comparisons.
    """

    def __init__(self, coors):
        self.pts_coors = coors
        n = coors.size(0)
        if coors.size(-1) == 3:
            batch = torch.zeros(n, dtype=torch.long)
            sp = coors
        else:
            batch = coors[:, 0].long()
            sp = coors[:, 1:]
        self.batch_size = int(batch.max().item()) + 1 if n else 1
        invalid = (sp < 0).any(dim=-1)
        key = torch.cat([batch.view(-1, 1), sp.long()], dim=-1)
        # push invalid rows to a sentinel so unique keeps them out
        uniq, inverse = torch.unique(key[~invalid], dim=0,
                                     return_inverse=True)
        maps = torch.full((n,), -1, dtype=torch.long)
        maps[~invalid] = inverse
        counts = torch.zeros(uniq.size(0), dtype=torch.long)
        counts.scatter_add_(0, inverse, torch.ones_like(inverse))
        if coors.size(-1) == 3:
            self.voxel_coors = uniq[:, 1:].to(coors.dtype)
        else:
            self.voxel_coors = uniq.to(coors.dtype)
        self.pts_voxel_maps = maps
        self.voxel_pts_counts = counts

    def mapback(self, voxel_feats, default_feat=0):
        invalid = self.pts_voxel_maps.lt(0)
        out = voxel_feats[self.pts_voxel_maps.clamp(min=0)]
        out = torch.where(invalid.view(-1, *([1] * (out.dim() - 1))),
                          torch.as_tensor(default_feat,
                                          dtype=out.dtype), out)
        return out

    def reduce(self, pts_feats, reduce_op):
        m = self.voxel_coors.size(0)
        c = pts_feats.size(-1)
        maps = self.pts_voxel_maps
        valid = maps.ge(0)
        if reduce_op in ('sum', 'mean'):
            out = torch.zeros(m, c, dtype=pts_feats.dtype)
            out.index_add_(0, maps[valid], pts_feats[valid])
            if reduce_op == 'mean':
                out = out / self.voxel_pts_counts.clamp(
                    min=1).view(-1, 1).type_as(out)
        elif reduce_op == 'max':
            out = torch.full((m, c), torch.finfo(pts_feats.dtype).min,
                             dtype=pts_feats.dtype)
            out = out.scatter_reduce(
                0, maps[valid].view(-1, 1).expand(-1, c),
                pts_feats[valid], reduce='amax', include_self=True)
            out = torch.where(self.voxel_pts_counts.view(-1, 1) > 0, out,
                              torch.zeros_like(out))
        else:
            raise ValueError(reduce_op)
        return out, self.voxel_coors

    def reduce_mapback(self, pts_feats, reduce_op, default_feat=0):
        voxel_feats, _ = self.reduce(pts_feats, reduce_op)
        return self.mapback(voxel_feats, default_feat)


@contextlib.contextmanager
def _stubbed(stubs):
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _load_as(pkg_file, mod_name):
    spec = importlib.util.spec_from_file_location(mod_name, pkg_file)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_pillar_encoders():
    """Load the reference ``models/voxel_encoders/{utils,pillar_encoder}.py``.

    Returns the pillar_encoder module (with PillarFeatureNet /
    DynamicPillarFeatureNet) and the utils module (with
    PointVoxelStatsCalculator).
    """
    mm_utils = _mod('mmdet3d.models.voxel_encoders.utils',
                    PFNLayer=oracles.PFNLayer,
                    get_paddings_indicator=oracles.get_paddings_indicator,
                    __all__=['PFNLayer', 'get_paddings_indicator'])
    stubs = {
        'mmcv': _mod('mmcv'),
        'mmcv.cnn': _mod('mmcv.cnn',
                         build_norm_layer=oracles.build_norm_layer),
        'mmcv.runner': _mod('mmcv.runner',
                            force_fp32=_noop_decorator_factory,
                            auto_fp16=_noop_decorator_factory),
        'mmdet3d': _mod('mmdet3d'),
        'mmdet3d.models': _mod('mmdet3d.models'),
        'mmdet3d.models.builder': _mod('mmdet3d.models.builder',
                                       VOXEL_ENCODERS=_NoopRegistry()),
        'mmdet3d.models.voxel_encoders': _mod(
            'mmdet3d.models.voxel_encoders'),
        'mmdet3d.models.voxel_encoders.utils': mm_utils,
    }
    # fake package mirroring mmdet3d_gaussian's tree for relative imports
    pkg = _mod('refpkg')
    pkg.__path__ = []
    ops = _mod('refpkg.ops', Scatter=TorchScatter)
    models = _mod('refpkg.models')
    models.__path__ = []
    enc = _mod('refpkg.models.voxel_encoders')
    enc.__path__ = []
    stubs.update({'refpkg': pkg, 'refpkg.ops': ops,
                  'refpkg.models': models,
                  'refpkg.models.voxel_encoders': enc})
    with _stubbed(stubs):
        utils = _load_as(f'{REF_ROOT}/models/voxel_encoders/utils.py',
                         'refpkg.models.voxel_encoders.utils')
        penc = _load_as(f'{REF_ROOT}/models/voxel_encoders/pillar_encoder.py',
                        'refpkg.models.voxel_encoders.pillar_encoder')
    return penc, utils


def load_gd_loss():
    """Load the reference ``gaussian_distance_loss.py`` (GDLoss etc.)."""
    stubs = {
        'mmdet': _mod('mmdet'),
        'mmdet.models': _mod('mmdet.models'),
        'mmdet.models.builder': _mod('mmdet.models.builder',
                                     LOSSES=_NoopRegistry()),
        'mmdet.models.losses': _mod('mmdet.models.losses'),
        'mmdet.models.losses.utils': _mod(
            'mmdet.models.losses.utils',
            weighted_loss=_weighted_loss),
    }
    with _stubbed(stubs):
        return _load_as(
            f'{REF_ROOT}/models/losses/gaussian_distance_loss.py',
            'ref_gd_loss_model')


def _weighted_loss(fn):
    @functools.wraps(fn)
    def wrapper(pred, target, weight=None, reduction='mean',
                avg_factor=None, **kwargs):
        loss = fn(pred, target, **kwargs)
        return oracles.weight_reduce_loss(loss, weight, reduction,
                                          avg_factor)
    return wrapper


def load_gd_anchor3d_head(gd_loss_mod):
    """Load the reference ``gd_anchor3d_head.py``.

    The upstream ``Anchor3DHead`` base is stubbed with just the pieces
    ``loss_single`` touches (``add_sin_difference``); losses are built by
    the torch oracles (FocalLoss/SmoothL1/CE) or the reference's own GDLoss.
    Instantiate via :func:`make_ref_head` — do not call ``__init__``.
    """

    class _Anchor3DHeadStub(nn.Module):
        add_sin_difference = staticmethod(oracles.add_sin_difference)

        def __init__(self, **kwargs):
            super().__init__()
            for k, v in kwargs.items():
                setattr(self, k, v)

    def build_loss(cfg):
        return oracles.build_loss_oracle(cfg, gd_loss_cls=gd_loss_mod.GDLoss)

    stubs = {
        'mmcv': _mod('mmcv'),
        'mmcv.runner': _mod('mmcv.runner',
                            force_fp32=_noop_decorator_factory),
        'mmdet': _mod('mmdet'),
        'mmdet.models': _mod('mmdet.models', HEADS=_NoopRegistry()),
        'mmdet.core': _mod('mmdet.core', multi_apply=None),
        'mmdet3d': _mod('mmdet3d'),
        'mmdet3d.models': _mod('mmdet3d.models'),
        'mmdet3d.models.dense_heads': _mod(
            'mmdet3d.models.dense_heads', Anchor3DHead=_Anchor3DHeadStub),
        'mmdet3d.models.builder': _mod('mmdet3d.models.builder',
                                       build_loss=build_loss),
    }
    with _stubbed(stubs):
        return _load_as(f'{REF_ROOT}/models/dense_heads/gd_anchor3d_head.py',
                        'ref_gd_anchor3d_head')


def make_ref_head(head_mod, gd_loss_mod, num_classes=3,
                  loss_decoded_bbox=None, code_weight=None,
                  decode_weight=1.0, diff_rad_by_sin=True):
    """Build a reference GDAnchor3DHead ready for ``loss_single`` without
    running the full (upstream-dependent) __init__."""
    head = object.__new__(head_mod.GDAnchor3DHead)
    nn.Module.__init__(head)
    head.num_classes = num_classes
    head.box_code_size = 7
    head.use_direction_classifier = True
    head.diff_rad_by_sin = diff_rad_by_sin
    head.bbox_coder = oracles.TorchDeltaXYZWLHRBBoxCoder()
    head.loss_cls = oracles.TorchFocalLoss(use_sigmoid=True, gamma=2.0,
                                           alpha=0.25, loss_weight=1.0)
    head.loss_bbox = oracles.TorchSmoothL1Loss(beta=1.0 / 9.0,
                                               loss_weight=2.0)
    if loss_decoded_bbox is None:
        loss_decoded_bbox = dict(type='GDLoss', loss_type='kld3d',
                                 center_offset=(0, 0, 0.5), fun='log1p',
                                 tau=1.0, alpha=1.0, loss_weight=5.0)
    head.loss_decoded_bbox = oracles.build_loss_oracle(
        loss_decoded_bbox, gd_loss_cls=gd_loss_mod.GDLoss)
    head.loss_dir = oracles.TorchCrossEntropyLoss(loss_weight=0.2)
    head.train_cfg = dict(code_weight=code_weight,
                          decode_weight=decode_weight)
    head.add_sin_difference = oracles.add_sin_difference
    return head


def load_gd_centerpoint_head():
    """Load the reference ``gd_centerpoint_head.py`` (CenterHeadRev /
    CenterGDHead) for target-building parity.

    The upstream pieces (``draw_heatmap_gaussian``, ``gaussian_radius``,
    ``multi_apply``, ``clip_sigmoid``, base ``CenterHead``) are stubbed with
    transcriptions in tests/torch_oracles.py.  Instantiate via
    :func:`make_ref_center_head` — do not call ``__init__``.
    """

    class _BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    class _CenterHeadStub(nn.Module):
        def __init__(self, **kwargs):
            super().__init__()

    stubs = {
        'mmcv': _mod('mmcv'),
        'mmcv.cnn': _mod('mmcv.cnn', CONV_LAYERS=_NoopRegistry()),
        'mmcv.runner': _mod('mmcv.runner',
                            force_fp32=_noop_decorator_factory,
                            BaseModule=_BaseModule),
        'mmdet': _mod('mmdet'),
        'mmdet.core': _mod('mmdet.core', multi_apply=oracles.multi_apply),
        'mmdet3d': _mod('mmdet3d'),
        'mmdet3d.core': _mod(
            'mmdet3d.core', circle_nms=None,
            draw_heatmap_gaussian=oracles.draw_heatmap_gaussian,
            gaussian_radius=oracles.gaussian_radius,
            xywhr2xyxyr=None),
        'mmdet3d.models': _mod('mmdet3d.models'),
        'mmdet3d.models.builder': _mod('mmdet3d.models.builder',
                                       HEADS=_NoopRegistry(),
                                       build_loss=lambda cfg: None),
        'mmdet3d.models.utils': _mod('mmdet3d.models.utils',
                                     clip_sigmoid=oracles.clip_sigmoid),
        'mmdet3d.models.dense_heads': _mod('mmdet3d.models.dense_heads',
                                           CenterHead=_CenterHeadStub),
        'mmdet3d.ops': _mod('mmdet3d.ops'),
        'mmdet3d.ops.iou3d': _mod('mmdet3d.ops.iou3d'),
        'mmdet3d.ops.iou3d.iou3d_utils': _mod(
            'mmdet3d.ops.iou3d.iou3d_utils', nms_gpu=None),
    }
    with _stubbed(stubs):
        return _load_as(
            f'{REF_ROOT}/models/dense_heads/gd_centerpoint_head.py',
            'ref_gd_centerpoint_head')


class FakeLiDARBoxes:
    """Just the two attributes the reference ``get_targets_single`` touches
    on LiDARInstance3DBoxes: ``tensor`` (N, 7+; bottom-center z) and
    ``gravity_center``."""

    def __init__(self, tensor):
        self.tensor = tensor

    @property
    def gravity_center(self):
        g = self.tensor[:, :3].clone()
        g[:, 2] = g[:, 2] + self.tensor[:, 5] * 0.5
        return g


def make_ref_center_head(head_mod, class_names, train_cfg):
    """Reference CenterHeadRev ready for ``get_targets`` without the
    (upstream-dependent) __init__."""
    head = object.__new__(head_mod.CenterHeadRev)
    nn.Module.__init__(head)
    head.class_names = [list(c) for c in class_names]
    head.task_heads = list(range(len(class_names)))   # only len() is used
    head.train_cfg = dict(train_cfg)
    return head


def load_centerpoint_coder():
    """Load the reference ``centerpoint_bbox_coders.py`` module."""
    class _Base:
        def __init__(self, *a, **k):
            pass

    stubs = {
        'mmdet': _mod('mmdet'),
        'mmdet.core': _mod('mmdet.core'),
        'mmdet.core.bbox': _mod('mmdet.core.bbox', BaseBBoxCoder=_Base),
        'mmdet.core.bbox.builder': _mod('mmdet.core.bbox.builder',
                                        BBOX_CODERS=_NoopRegistry()),
    }
    with _stubbed(stubs):
        return _load_as(
            '/root/reference/mmdet3d_gaussian/core/bbox/coders/'
            'centerpoint_bbox_coders.py', 'ref_cp_coder_for_head')


def load_centerpoint_yaw_coder():
    """Load the reference ``centerpoint_bbox_yaw_coders.py`` (needs the base
    CenterPointBBoxCoderRev importable from its parent package)."""
    class _Base:
        def __init__(self, *a, **k):
            pass

    base_dir = '/root/reference/mmdet3d_gaussian/core/bbox/coders/'
    stubs = {
        'mmdet': _mod('mmdet'),
        'mmdet.core': _mod('mmdet.core'),
        'mmdet.core.bbox': _mod('mmdet.core.bbox', BaseBBoxCoder=_Base),
        'mmdet.core.bbox.builder': _mod('mmdet.core.bbox.builder',
                                        BBOX_CODERS=_NoopRegistry()),
    }
    pkg = _mod('refcpcoders')
    pkg.__path__ = []
    stubs['refcpcoders'] = pkg
    with _stubbed(stubs):
        base = _load_as(base_dir + 'centerpoint_bbox_coders.py',
                        'refcpcoders.centerpoint_bbox_coders')
        pkg.CenterPointBBoxCoderRev = base.CenterPointBBoxCoderRev
        yaw = _load_as(base_dir + 'centerpoint_bbox_yaw_coders.py',
                       'refcpcoders.centerpoint_bbox_yaw_coders')
    return yaw


def load_pillar_mvf():
    """Load the reference ``pillar_mvf_encoder.py`` (PillarMVFFeatureNet +
    SingleViewNet) with upstream pieces from tests/torch_oracles.py."""
    stubs = {
        'mmcv': _mod('mmcv'),
        'mmcv.cnn': _mod('mmcv.cnn',
                         build_norm_layer=oracles.build_norm_layer,
                         build_upsample_layer=oracles.build_upsample_layer),
        'mmcv.runner': _mod('mmcv.runner',
                            force_fp32=_noop_decorator_factory,
                            auto_fp16=_noop_decorator_factory),
        'mmdet': _mod('mmdet'),
        'mmdet.models': _mod('mmdet.models'),
        'mmdet.models.backbones': _mod('mmdet.models.backbones'),
        'mmdet.models.backbones.resnet': _mod(
            'mmdet.models.backbones.resnet',
            BasicBlock=oracles.BasicBlockOracle),
        'mmdet3d': _mod('mmdet3d'),
        'mmdet3d.models': _mod('mmdet3d.models'),
        'mmdet3d.models.builder': _mod('mmdet3d.models.builder',
                                       VOXEL_ENCODERS=_NoopRegistry()),
        'mmdet3d.models.middle_encoders': _mod(
            'mmdet3d.models.middle_encoders',
            PointPillarsScatter=oracles.TorchPointPillarsScatter),
        'mmdet3d.models.voxel_encoders': _mod(
            'mmdet3d.models.voxel_encoders'),
        'mmdet3d.models.voxel_encoders.utils': _mod(
            'mmdet3d.models.voxel_encoders.utils',
            PFNLayer=oracles.PFNLayer,
            get_paddings_indicator=oracles.get_paddings_indicator),
    }
    pkg = _mod('refmvf')
    pkg.__path__ = []
    ops = _mod('refmvf.ops', Scatter=TorchScatter)
    models = _mod('refmvf.models')
    models.__path__ = []
    enc = _mod('refmvf.models.voxel_encoders')
    enc.__path__ = []
    stubs.update({'refmvf': pkg, 'refmvf.ops': ops,
                  'refmvf.models': models,
                  'refmvf.models.voxel_encoders': enc})
    with _stubbed(stubs):
        _load_as(f'{REF_ROOT}/models/voxel_encoders/utils.py',
                 'refmvf.models.voxel_encoders.utils')
        return _load_as(
            f'{REF_ROOT}/models/voxel_encoders/pillar_mvf_encoder.py',
            'refmvf.models.voxel_encoders.pillar_mvf_encoder')


def load_sim_ota(iou3d_fn):
    """Load the reference ``sim_ota_3d_assigner.py``.

    iou3d_fn(det_np (N, 7), gt_np (G, 7)) -> (N, G) numpy 3D IoU stands in
    for the upstream ``LiDARInstance3DBoxes.overlaps`` (CUDA); the assigner
    logic under test is the gating / cost / dynamic-k protocol.
    """
    import numpy as _np

    class _AssignResult:
        def __init__(self, num_gts, gt_inds, max_overlaps, labels=None):
            self.num_gts = num_gts
            self.gt_inds = gt_inds
            self.max_overlaps = max_overlaps
            self.labels = labels

    class _FakeBoxes:
        def __init__(self, tensor, box_dim=7, with_yaw=True):
            self.tensor = tensor

        @staticmethod
        def overlaps(a, b):
            m = iou3d_fn(_np.asarray(a.tensor.detach(), _np.float64),
                         _np.asarray(b.tensor.detach(), _np.float64))
            return torch.tensor(m, dtype=torch.float32)

    stubs = {
        'mmdet': _mod('mmdet'),
        'mmdet.core': _mod('mmdet.core'),
        'mmdet.core.bbox': _mod('mmdet.core.bbox'),
        'mmdet.core.bbox.assigners': _mod('mmdet.core.bbox.assigners',
                                          BaseAssigner=object,
                                          AssignResult=_AssignResult),
        'mmdet.core.bbox.builder': _mod('mmdet.core.bbox.builder',
                                        BBOX_ASSIGNERS=_NoopRegistry()),
        'mmdet3d': _mod('mmdet3d'),
        'mmdet3d.ops': _mod('mmdet3d.ops',
                            points_in_boxes_all=oracles.points_in_boxes_all),
        'mmdet3d.core': _mod('mmdet3d.core'),
        'mmdet3d.core.bbox': _mod('mmdet3d.core.bbox'),
        'mmdet3d.core.bbox.structures': _mod('mmdet3d.core.bbox.structures'),
        'mmdet3d.core.bbox.structures.lidar_box3d': _mod(
            'mmdet3d.core.bbox.structures.lidar_box3d',
            LiDARInstance3DBoxes=_FakeBoxes),
    }
    with _stubbed(stubs):
        return _load_as(
            f'{REF_ROOT}/core/bbox/assigners/sim_ota_3d_assigner.py',
            'ref_sim_ota')


def load_pointwise_mask_head():
    """Load the reference ``pointwise_mask_head.py``.  Returns the module;
    gt boxes passed to ``get_targets`` must provide ``enlarged_box`` /
    ``points_in_boxes_part`` (see :class:`FakePartBoxes`)."""

    class _BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    stubs = {
        'mmcv': _mod('mmcv'),
        'mmcv.runner': _mod('mmcv.runner', BaseModule=_BaseModule),
        'mmcv.cnn': _mod('mmcv.cnn'),
        'mmcv.cnn.bricks': _mod('mmcv.cnn.bricks',
                                build_norm_layer=oracles.build_norm_layer),
        'mmdet': _mod('mmdet'),
        'mmdet.core': _mod('mmdet.core', multi_apply=oracles.multi_apply),
        'mmdet.models': _mod('mmdet.models', HEADS=_NoopRegistry()),
        'mmdet3d': _mod('mmdet3d'),
        'mmdet3d.models': _mod('mmdet3d.models'),
        'mmdet3d.models.builder': _mod(
            'mmdet3d.models.builder',
            build_loss=lambda cfg: oracles.build_loss_oracle(cfg)),
    }
    with _stubbed(stubs):
        return _load_as(
            f'{REF_ROOT}/models/roi_heads/mask_heads/pointwise_mask_head.py',
            'ref_pointwise_mask_head')


class FakePartBoxes:
    """Minimal LiDARInstance3DBoxes for PointwiseMaskHead.get_targets:
    bottom-center z rows + mmdet3d ``enlarged_box`` (dims + 2w, z - w) and
    ``points_in_boxes_part`` (first containing box, -1 otherwise)."""

    def __init__(self, tensor):
        self.tensor = tensor

    def to(self, device):
        return self

    def enlarged_box(self, extra_width):
        t = self.tensor.clone()
        t[:, 3:6] += 2 * extra_width
        t[:, 2] -= extra_width
        return FakePartBoxes(t)

    def points_in_boxes_part(self, xyz):
        inside = oracles.points_in_boxes_all(
            xyz[None], self.tensor[None])[0] > 0          # (N, T)
        any_in = inside.any(-1)
        first = inside.float().argmax(-1)
        return torch.where(any_in, first, torch.full_like(first, -1))


def load_voxel_set_abstraction():
    """Load the reference ``voxel_set_abstraction.py`` with the vsa ops
    replaced by the transcribed torch oracles."""

    def _is_norm(m):
        return isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d))

    stubs = {
        'mmcv': _mod('mmcv'),
        'mmcv.cnn': _mod('mmcv.cnn'),
        'mmcv.cnn.bricks': _mod('mmcv.cnn.bricks',
                                build_norm_layer=oracles.build_norm_layer,
                                is_norm=_is_norm),
        'mmdet3d': _mod('mmdet3d'),
        'mmdet3d.models': _mod('mmdet3d.models'),
        'mmdet3d.models.builder': _mod('mmdet3d.models.builder',
                                       MIDDLE_ENCODERS=_NoopRegistry()),
    }
    pkg = _mod('refvsa')
    pkg.__path__ = []
    models = _mod('refvsa.models')
    models.__path__ = []
    mid = _mod('refvsa.models.middle_encoders')
    mid.__path__ = []
    ops = _mod('refvsa.ops')
    ops.__path__ = []
    vsa_ops = _mod('refvsa.ops.vsa',
                   QueryAndGroup=oracles.QueryAndGroupOracle,
                   furthest_point_sample=oracles.furthest_point_sample)
    stubs.update({'refvsa': pkg, 'refvsa.models': models,
                  'refvsa.models.middle_encoders': mid,
                  'refvsa.ops': ops, 'refvsa.ops.vsa': vsa_ops})
    with _stubbed(stubs):
        return _load_as(
            f'{REF_ROOT}/models/middle_encoders/voxel_set_abstraction.py',
            'refvsa.models.middle_encoders.voxel_set_abstraction')


def load_pvrcnn_bbox_head():
    """Load the reference ``pvrcnn_bbox_head.py``.  The forward path is
    plain Conv1d/BN/Dropout; structures/spconv/nms imports are stubbed (the
    mmdet3d-1.0 ``rotation_3d_in_axis`` transcription comes from
    torch_oracles via the caller when exercising loss paths)."""

    class _BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

    def rotation_3d_in_axis(points, angles, axis=2):
        # mmdet3d 1.0 convention: x' = x cos - y sin (CCW by +angle)
        c, s = torch.cos(angles), torch.sin(angles)
        x, y, z = points[..., 0], points[..., 1], points[..., 2]
        assert axis == 2
        return torch.stack([c[:, None] * x - s[:, None] * y,
                            s[:, None] * x + c[:, None] * y, z], dim=-1)

    import numpy as _np

    class _CornersBoxes:
        """LiDARInstance3DBoxes for the corner loss: bottom-center z rows,
        mmdet3d corner template (origin (0.5, 0.5, 0))."""

        def __init__(self, tensor):
            self.tensor = tensor

        def clone(self):
            return _CornersBoxes(self.tensor.clone())

        @property
        def corners(self):
            t = self.tensor
            norm = _np.stack(_np.unravel_index(_np.arange(8), [2] * 3),
                             axis=1)
            norm = norm[[0, 1, 3, 2, 6, 7, 5, 4]] - _np.array([0.5, 0.5, 0.])
            corners = torch.tensor(norm, dtype=t.dtype)[None] \
                * t[:, None, 3:6]
            corners = rotation_3d_in_axis(corners, t[:, 6], axis=2)
            return corners + t[:, None, 0:3]

    stubs = {
        'mmcv': _mod('mmcv'),
        'mmcv.cnn': _mod('mmcv.cnn'),
        'mmcv.cnn.bricks': _mod('mmcv.cnn.bricks',
                                build_norm_layer=oracles.build_norm_layer),
        'mmcv.runner': _mod('mmcv.runner', BaseModule=_BaseModule),
        'mmdet': _mod('mmdet'),
        'mmdet.core': _mod(
            'mmdet.core', multi_apply=oracles.multi_apply,
            build_bbox_coder=lambda cfg:
                oracles.TorchDeltaXYZWLHRBBoxCoder()),
        'mmdet.models': _mod('mmdet.models', HEADS=_NoopRegistry()),
        'mmdet3d': _mod('mmdet3d'),
        'mmdet3d.core': _mod('mmdet3d.core'),
        'mmdet3d.core.bbox': _mod('mmdet3d.core.bbox'),
        'mmdet3d.core.bbox.structures': _mod(
            'mmdet3d.core.bbox.structures',
            LiDARInstance3DBoxes=_CornersBoxes,
            rotation_3d_in_axis=rotation_3d_in_axis,
            xywhr2xyxyr=None),
        'mmdet3d.models': _mod('mmdet3d.models'),
        'mmdet3d.models.builder': _mod(
            'mmdet3d.models.builder',
            build_loss=lambda cfg: oracles.build_loss_oracle(cfg)),
        'mmdet3d.ops': _mod('mmdet3d.ops', spconv=_mod('spconv')),
        'mmdet3d.ops.iou3d': _mod('mmdet3d.ops.iou3d'),
        'mmdet3d.ops.iou3d.iou3d_utils': _mod(
            'mmdet3d.ops.iou3d.iou3d_utils', nms_gpu=None,
            nms_normal_gpu=None),
    }
    with _stubbed(stubs):
        return _load_as(
            f'{REF_ROOT}/models/roi_heads/bbox_heads/pvrcnn_bbox_head.py',
            'ref_pvrcnn_bbox_head')
