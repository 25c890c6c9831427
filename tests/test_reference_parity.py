"""Run the REFERENCE torch loss code (CPU) against our JAX losses.

The BASELINE.json metric asks for "fwd/bwd numerics allclose vs the
reference CUDA path"; no GPU exists here, but the reference's
``gaussian_distance_loss.py`` is pure torch and runs on CPU.  We import it
from the read-only checkout with its mmdet dependencies stubbed (a no-op
registry + a faithful ``weighted_loss`` decorator), then compare loss
values AND input gradients for every loss type in the bag.
"""
import functools
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REF = '/root/reference/mmdet3d_gaussian/models/losses/gaussian_distance_loss.py'


def _weight_reduce_loss_torch(loss, weight=None, reduction='mean',
                              avg_factor=None):
    # mmdet.models.losses.utils semantics
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if reduction == 'mean':
            return loss.mean()
        if reduction == 'sum':
            return loss.sum()
        return loss
    if reduction == 'mean':
        return loss.sum() / avg_factor
    if reduction == 'none':
        return loss
    raise ValueError('avg_factor + sum unsupported')


def _weighted_loss(fn):
    @functools.wraps(fn)
    def wrapper(pred, target, weight=None, reduction='mean',
                avg_factor=None, **kwargs):
        loss = fn(pred, target, **kwargs)
        return _weight_reduce_loss_torch(loss, weight, reduction, avg_factor)
    return wrapper


@pytest.fixture(scope='module')
def ref_mod():
    """Load the reference loss module with mmdet stubbed out."""
    saved = {k: sys.modules.get(k) for k in
             ('mmdet', 'mmdet.models', 'mmdet.models.builder',
              'mmdet.models.losses', 'mmdet.models.losses.utils')}
    mmdet = types.ModuleType('mmdet')
    models = types.ModuleType('mmdet.models')
    builder = types.ModuleType('mmdet.models.builder')

    class _Reg:
        @staticmethod
        def register_module(*a, **k):
            def deco(cls):
                return cls
            return deco

    builder.LOSSES = _Reg()
    losses = types.ModuleType('mmdet.models.losses')
    utils = types.ModuleType('mmdet.models.losses.utils')
    utils.weighted_loss = _weighted_loss
    sys.modules.update({'mmdet': mmdet, 'mmdet.models': models,
                        'mmdet.models.builder': builder,
                        'mmdet.models.losses': losses,
                        'mmdet.models.losses.utils': utils})
    try:
        spec = importlib.util.spec_from_file_location('ref_gd_loss', REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _boxes(seed, n=24):
    rng = np.random.RandomState(seed)
    ctr = rng.uniform(-10, 10, (n, 3))
    dims = rng.uniform(0.8, 4.5, (n, 3))
    yaw = rng.uniform(-np.pi, np.pi, (n, 1))
    return np.concatenate([ctr, dims, yaw], -1).astype(np.float32)


CASES = [
    ('gwd3d', 'log1p', 1.0),
    ('kld3d', 'log1p', 1.0),
    ('kld3d', 'none', 0.0),
    ('bd3d', 'log1p', 1.0),
    ('jd3d', 'log1p', 1.0),
    ('kld3d_symmax', 'log1p', 1.0),
    ('kld3d_symmin', 'log1p', 1.0),
    ('kfiou3d', 'expm1', 0.0),
    ('kfiou3d', 'nlog', 0.0),
]


@pytest.mark.parametrize('loss_type,fun,tau', CASES,
                         ids=[f'{t}-{f}' for t, f, _ in CASES])
def test_loss_value_and_grad_match_reference(ref_mod, loss_type, fun, tau):
    import jax
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.losses.gaussian import GDLoss

    pred_np = _boxes(0)
    # targets near preds (realistic regression regime, away from the
    # zero-distance sqrt boundary)
    tgt_np = pred_np + _boxes(1) * 0.05
    w_np = np.random.RandomState(2).rand(len(pred_np)).astype(np.float32)
    w_np[::5] = 0.0
    avg = float(w_np.sum())

    # reference torch path (fp64 for a clean oracle)
    pred_t = torch.tensor(pred_np, dtype=torch.float64,
                          requires_grad=True)
    tgt_t = torch.tensor(tgt_np, dtype=torch.float64)
    ref = ref_mod.GDLoss(loss_type, fun=fun, tau=tau, loss_weight=2.5)
    ref_loss = ref(pred_t, tgt_t, weight=torch.tensor(w_np,
                                                      dtype=torch.float64),
                   avg_factor=avg)
    ref_loss.backward()
    ref_grad = pred_t.grad.numpy()

    ours = GDLoss(loss_type, fun=fun, tau=tau, loss_weight=2.5)

    def f(p):
        return ours(p, jnp.asarray(tgt_np), weight=jnp.asarray(w_np),
                    avg_factor=avg)

    our_loss = float(f(jnp.asarray(pred_np)))
    our_grad = np.asarray(jax.grad(f)(jnp.asarray(pred_np)))

    np.testing.assert_allclose(our_loss, float(ref_loss.detach()),
                               rtol=2e-4,
                               err_msg=f'{loss_type}/{fun} value')
    # grads: rows with weight 0 must be zero in ours (by construction);
    # the reference also zeroes them through the weight product
    np.testing.assert_allclose(our_grad, ref_grad, rtol=5e-3, atol=1e-5,
                               err_msg=f'{loss_type}/{fun} grad')


def test_preprocess_matches_reference(ref_mod):
    """Gaussian parameterization itself: center shift + covariance."""
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.losses.gaussian import gaussian_params

    b = _boxes(3)
    xyz_t, R_t, S_t, Sl_t = ref_mod.preprocess(
        torch.tensor(b, dtype=torch.float64), (0, 0, 0.5))
    gp = gaussian_params(jnp.asarray(b), (0., 0., 0.5))
    xy = np.stack([np.asarray(gp['x']), np.asarray(gp['y'])], -1)
    np.testing.assert_allclose(xy, xyz_t.numpy()[:, :2], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp['z']), xyz_t.numpy()[:, 2],
                               rtol=1e-5)
    # BEV covariance: R S S R^T vs our semi-axis components
    cov_ref = (R_t @ S_t @ S_t @ R_t.transpose(1, 2)).numpy()
    a = np.asarray(gp['a'], np.float64)
    bb = np.asarray(gp['b'], np.float64)
    c = np.asarray(gp['cos'], np.float64)
    s = np.asarray(gp['sin'], np.float64)
    sxx = a * a * c * c + bb * bb * s * s
    sxy = (a * a - bb * bb) * c * s
    syy = a * a * s * s + bb * bb * c * c
    np.testing.assert_allclose(sxx, cov_ref[:, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(sxy, cov_ref[:, 0, 1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(syy, cov_ref[:, 1, 1], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp['sl'], np.float64) ** 2,
                               (Sl_t ** 2).numpy(), rtol=1e-5)


@pytest.fixture(scope='module')
def ref_coders():
    """Load the reference coder modules with mmdet stubbed out."""
    saved = {k: sys.modules.get(k) for k in
             ('mmdet', 'mmdet.core', 'mmdet.core.bbox',
              'mmdet.core.bbox.builder', 'refcoders')}

    class _Reg:
        @staticmethod
        def register_module(*a, **k):
            def deco(cls):
                return cls
            return deco

    class _Base:
        def __init__(self, *a, **k):
            pass

    mmdet = types.ModuleType('mmdet')
    core = types.ModuleType('mmdet.core')
    bbox = types.ModuleType('mmdet.core.bbox')
    bbox.BaseBBoxCoder = _Base
    builder = types.ModuleType('mmdet.core.bbox.builder')
    builder.BBOX_CODERS = _Reg()
    pkg = types.ModuleType('refcoders')
    pkg.__path__ = []
    sys.modules.update({'mmdet': mmdet, 'mmdet.core': core,
                        'mmdet.core.bbox': bbox,
                        'mmdet.core.bbox.builder': builder,
                        'refcoders': pkg})
    base = '/root/reference/mmdet3d_gaussian/core/bbox/coders/'
    try:
        mods = {}
        for name in ('centerpoint_bbox_coders', 'point_bbox_yaw_coders',
                     'centerpoint_bbox_yaw_coders'):
            if name == 'centerpoint_bbox_yaw_coders':
                # `from . import CenterPointBBoxCoderRev`
                pkg.CenterPointBBoxCoderRev = \
                    mods['centerpoint_bbox_coders'].CenterPointBBoxCoderRev
            spec = importlib.util.spec_from_file_location(
                f'refcoders.{name}', base + name + '.py')
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f'refcoders.{name}'] = mod
            spec.loader.exec_module(mod)
            mods[name] = mod
        yield mods
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for name in ('centerpoint_bbox_coders', 'point_bbox_yaw_coders',
                     'centerpoint_bbox_yaw_coders'):
            sys.modules.pop(f'refcoders.{name}', None)


@pytest.mark.parametrize('correct_yaw', [True, False])
def test_point_bbox_yaw_coder_matches_reference(ref_coders, correct_yaw):
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.core.bbox.coders import PointBBoxYawCoder

    ref = ref_coders['point_bbox_yaw_coders'].PointBBoxYawCoder()
    ours = PointBBoxYawCoder()
    rng = np.random.RandomState(5)

    # encode
    boxes = _boxes(6).reshape(1, -1, 7)
    enc_ref = ref.encode(torch.tensor(boxes)).numpy()
    enc_our = np.asarray(ours.encode(jnp.asarray(boxes)))
    np.testing.assert_allclose(enc_our, enc_ref, rtol=1e-6)

    # decode — includes dir-vs-yaw mismatches that trigger the rot90 snap
    priors = np.concatenate(
        [rng.uniform(-20, 20, (1, 24, 2)),
         rng.choice([1., 2., 4.], (1, 24, 1))], -1).astype(np.float32)
    preds = rng.randn(1, 24, 9).astype(np.float32)
    dec_ref = ref.decode(torch.tensor(priors), torch.tensor(preds),
                         correct_yaw=correct_yaw).numpy()
    dec_our = np.asarray(ours.decode(jnp.asarray(priors),
                                     jnp.asarray(preds),
                                     correct_yaw=correct_yaw))
    np.testing.assert_allclose(dec_our, dec_ref, rtol=1e-4, atol=1e-5)


def test_centerpoint_yaw_coder_matches_reference(ref_coders):
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.core.bbox.coders import CenterPointBBoxYawCoder

    pc_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    vs = (0.2, 0.2, 8.0)
    ref = ref_coders['centerpoint_bbox_yaw_coders'].CenterPointBBoxYawCoder(
        pc_range=pc_range, out_size_factor=4, voxel_size=vs)
    ours = CenterPointBBoxYawCoder(pc_range=pc_range, voxel_size=vs,
                                   out_size_factor=4)

    rng = np.random.RandomState(7)
    k = 32
    locs = rng.randint(0, 128, (1, k, 2)).astype(np.float32)
    preds = rng.randn(1, k, 9).astype(np.float32)
    dec_ref = ref.decode(torch.tensor(locs), torch.tensor(preds)).numpy()
    dec_our = np.asarray(ours.decode_cells(
        jnp.asarray(preds), jnp.asarray(locs[..., 0]),
        jnp.asarray(locs[..., 1])))
    # conventions: the reference emits gravity-center z and converts to
    # bottom-center later in the head; ours emits bottom-center directly
    np.testing.assert_allclose(dec_our[..., :2], dec_ref[..., :2],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(dec_our[..., 2] + dec_our[..., 5] * 0.5,
                               dec_ref[..., 2], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dec_our[..., 3:7], dec_ref[..., 3:7],
                               rtol=1e-4, atol=1e-5)
