"""BEV canvas splat: Pallas kernel (interpret mode) + custom-VJP paths.

The forward op replaces the reference ``PointPillarsScatter`` splat
(``/root/reference/mmdet3d_gaussian/models/voxel_encoders/pillar_mvf_encoder.py:10``
import site); semantics oracle is a plain numpy scatter of unique rows.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.ops.voxelize import _splat, bev_scatter
from mmdet3d_gaussian_tpu.ops.pallas.bev_splat_kernel import bev_splat_pallas


def _case(ncell=4096, v=1024, c=64, nval=700, seed=0):
    rng = np.random.RandomState(seed)
    lin = np.full(v, ncell, np.int32)
    lin[:nval] = np.sort(
        rng.choice(ncell, nval, replace=False)).astype(np.int32)
    feats = rng.randn(v, c).astype(np.float32)
    canvas = np.zeros((ncell, c), np.float32)
    canvas[lin[:nval]] = feats[:nval]
    return jnp.asarray(feats), jnp.asarray(lin), canvas


def test_pallas_splat_interpret_f32():
    feats, lin, exp = _case()
    out = bev_splat_pallas(feats, lin, exp.shape[0],
                           jnp.float32, True)
    # f32 packing: only the MXU one-hot matmul rounds (bf16 operands under
    # Mosaic DEFAULT precision; interpret mode is exact)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=0, atol=0)


def test_pallas_splat_interpret_bf16():
    feats, lin, exp = _case()
    out = bev_splat_pallas(feats, lin, exp.shape[0], None, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out).astype(np.float32), exp,
                               rtol=1 / 128, atol=1e-6)


def test_pallas_splat_nondivisible_ncell():
    # ncell % block != 0 exercises the partial tail block + final slice
    feats, lin, exp = _case(ncell=4096 + 300, v=1024, nval=600, seed=1)
    out = bev_splat_pallas(feats, lin, exp.shape[0], jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=0, atol=0)


def test_splat_custom_vjp_matches_dense_oracle():
    feats, lin, exp = _case(ncell=2048, v=528, c=8, nval=400)
    w = jnp.asarray(np.random.RandomState(3).randn(*exp.shape)
                    .astype(np.float32))

    def loss(f):
        return jnp.sum(_splat(f, lin, exp.shape[0], True) * w)

    g = jax.grad(loss)(feats)
    g_exp = np.zeros(feats.shape, np.float32)
    valid = np.asarray(lin) < exp.shape[0]
    g_exp[valid] = np.asarray(w)[np.asarray(lin)[valid]]
    np.testing.assert_allclose(np.asarray(g), g_exp, rtol=1e-6, atol=1e-6)


def test_bev_scatter_values_and_grad_dtype():
    b, ny, nx, c = 2, 16, 24, 8
    ncell = b * ny * nx
    rng = np.random.RandomState(0)
    nval, v = 300, 600
    lin = np.full(v, ncell, np.int32)
    lin[:nval] = np.sort(
        rng.choice(ncell, nval, replace=False)).astype(np.int32)
    coords = np.full((v, 4), -1, np.int32)
    bb = lin[:nval] // (ny * nx)
    rem = lin[:nval] % (ny * nx)
    coords[:nval, 0] = bb
    coords[:nval, 2] = rem // nx
    coords[:nval, 1] = rem % nx
    feats = rng.randn(v, c).astype(np.float32)
    canvas = np.asarray(bev_scatter(jnp.asarray(feats), jnp.asarray(coords),
                                    b, nx, ny, True))
    exp = np.zeros((ncell, c), np.float32)
    exp[lin[:nval]] = feats[:nval]
    np.testing.assert_allclose(canvas.reshape(-1, c), exp, rtol=1e-6)

    # grad flows with the primal's dtype
    gfun = jax.grad(lambda f: jnp.sum(
        bev_scatter(f, jnp.asarray(coords), b, nx, ny, True) ** 2))
    g = gfun(jnp.asarray(feats))
    assert g.dtype == jnp.float32 and bool(jnp.isfinite(g).all())


# ---------------------------------------------------------------------------
# Parity-pair splat (s2d sub-cell layout): kernel + custom VJP


def _pairs_case(ncell2=2048, v=2048, c=60, npairs=300, nsingle=200, seed=0):
    """Sorted rows where some paired cells receive BOTH parities."""
    rng = np.random.RandomState(seed)
    cells = np.sort(rng.choice(ncell2, npairs + nsingle, replace=False))
    rows = []
    for i, cell in enumerate(cells):
        if i < npairs:
            rows += [(cell, 0), (cell, 1)]
        else:
            rows.append((cell, rng.randint(2)))
    rows = rows[:v]
    lin2 = np.full(v, ncell2, np.int32)
    par = np.zeros(v, np.int32)
    for i, (cell, p) in enumerate(rows):
        lin2[i], par[i] = cell, p
    order = np.argsort(lin2 * 2 + par, kind='stable')
    lin2, par = lin2[order], par[order]
    feats = rng.randn(v, c).astype(np.float32)
    exp = np.zeros((ncell2, 2 * c), np.float32)
    for i in range(v):
        if lin2[i] < ncell2:
            off = par[i] * c
            exp[lin2[i], off:off + c] += feats[i]
    return (jnp.asarray(feats), jnp.asarray(lin2), jnp.asarray(par), exp)


def test_pallas_pairs_splat_interpret():
    from mmdet3d_gaussian_tpu.ops.pallas.bev_splat_kernel import (
        bev_splat_pairs_pallas)
    feats, lin2, par, exp = _pairs_case()
    out = bev_splat_pairs_pallas(feats, lin2, par, exp.shape[0],
                                 jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=0, atol=0)


def test_pallas_pairs_splat_nondivisible():
    from mmdet3d_gaussian_tpu.ops.pallas.bev_splat_kernel import (
        bev_splat_pairs_pallas)
    feats, lin2, par, exp = _pairs_case(ncell2=2048 + 100, seed=2)
    out = bev_splat_pairs_pallas(feats, lin2, par, exp.shape[0],
                                 jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=0, atol=0)


def test_splat_pairs_custom_vjp_matches_dense_oracle():
    from mmdet3d_gaussian_tpu.ops.voxelize import _splat_pairs
    feats, lin2, par, exp = _pairs_case(ncell2=1024, v=2048, c=8,
                                        npairs=150, nsingle=100, seed=3)
    w = jnp.asarray(np.random.RandomState(3).randn(*exp.shape)
                    .astype(np.float32))

    def loss(f):
        return jnp.sum(_splat_pairs(f, lin2, par, exp.shape[0], True) * w)

    out = _splat_pairs(feats, lin2, par, exp.shape[0], True)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=0, atol=1e-5)
    g = jax.grad(loss)(feats)
    # d feats[i] = w[lin2[i], par[i]*c : +c] for valid rows else 0
    wnp = np.asarray(w)
    gexp = np.zeros_like(np.asarray(feats))
    lin2n, parn = np.asarray(lin2), np.asarray(par)
    for i in range(feats.shape[0]):
        if lin2n[i] < exp.shape[0]:
            off = parn[i] * feats.shape[1]
            gexp[i] = wnp[lin2n[i], off:off + feats.shape[1]]
    np.testing.assert_allclose(np.asarray(g), gexp, rtol=1e-6, atol=1e-6)
