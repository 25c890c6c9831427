"""Sparse 3D conv vs dense conv oracle (scipy-free, pure numpy)."""
import numpy as np
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.ops.sparse_conv import (SparseTensor,
                                                  dense_index_map,
                                                  make_sparse_tensor,
                                                  sparse_conv3d,
                                                  sparse_to_dense,
                                                  submanifold_conv3d)


def make_inputs(seed=0, v=40, shape=(1, 6, 8, 8), cin=4):
    rng = np.random.RandomState(seed)
    b, nz, ny, nx = shape
    # unique random coords
    all_coords = np.stack(np.meshgrid(np.arange(b), np.arange(nz),
                                      np.arange(ny), np.arange(nx),
                                      indexing='ij'), -1).reshape(-1, 4)
    pick = rng.choice(len(all_coords), v, replace=False)
    coords = all_coords[pick].astype(np.int32)
    feats = rng.randn(v, cin).astype(np.float32)
    # add padding rows
    pad = 8
    coords = np.concatenate([coords, -np.ones((pad, 4), np.int32)], 0)
    feats = np.concatenate([feats, rng.randn(pad, cin).astype(np.float32)],
                           0)
    return feats, coords, shape


def dense_from(feats, coords, shape, cin):
    d = np.zeros(shape + (cin,), np.float32)
    for f, c in zip(feats, coords):
        if (c >= 0).all():
            d[c[0], c[1], c[2], c[3]] = f
    return d


def dense_conv3d(x, w, stride=1, pad=1):
    """x (B,Z,Y,X,Cin), w (kz,ky,kx,Cin,Cout) valid-on-padded oracle."""
    b, nz, ny, nx, cin = x.shape
    kz, ky, kx, _, cout = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)))
    oz = (nz + 2 * pad - kz) // stride + 1
    oy = (ny + 2 * pad - ky) // stride + 1
    ox = (nx + 2 * pad - kx) // stride + 1
    out = np.zeros((b, oz, oy, ox, cout), np.float32)
    for z in range(oz):
        for y in range(oy):
            for xx in range(ox):
                patch = xp[:, z * stride:z * stride + kz,
                           y * stride:y * stride + ky,
                           xx * stride:xx * stride + kx, :]
                out[:, z, y, xx] = np.tensordot(patch, w, axes=([1, 2, 3, 4],
                                                                [0, 1, 2, 3]))
    return out


def test_submanifold_matches_dense_at_active_sites():
    feats, coords, shape = make_inputs()
    cin, cout = 4, 6
    rng = np.random.RandomState(1)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape)
    out = submanifold_conv3d(st, jnp.asarray(w))

    dense_in = dense_from(feats, coords, shape, cin)
    w_dense = w.reshape(3, 3, 3, cin, cout)
    dense_out = dense_conv3d(dense_in, w_dense, stride=1, pad=1)

    oc = np.asarray(out.coords)
    of = np.asarray(out.feats)
    ov = np.asarray(out.valid)
    for i in range(len(oc)):
        if not ov[i]:
            continue
        b, z, y, x = oc[i]
        np.testing.assert_allclose(of[i], dense_out[b, z, y, x], rtol=1e-4,
                                   atol=1e-4)


def test_strided_sparse_conv_matches_dense():
    feats, coords, shape = make_inputs(seed=2)
    cin, cout = 4, 5
    rng = np.random.RandomState(3)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape)
    out = sparse_conv3d(st, jnp.asarray(w), stride=2, out_capacity=64)

    dense_in = dense_from(feats, coords, shape, cin)
    dense_out = dense_conv3d(dense_in, w.reshape(3, 3, 3, cin, cout),
                             stride=2, pad=1)

    oc = np.asarray(out.coords)
    of = np.asarray(out.feats)
    ov = np.asarray(out.valid)
    assert ov.sum() > 0
    for i in range(len(oc)):
        if not ov[i]:
            continue
        b, z, y, x = oc[i]
        np.testing.assert_allclose(of[i], dense_out[b, z, y, x], rtol=1e-4,
                                   atol=1e-4)
    # every nonzero dense output cell is covered by a sparse site
    nz_cells = set(map(tuple, np.argwhere(
        np.abs(dense_out).sum(-1) > 1e-5)))
    sparse_cells = set(map(tuple, oc[ov]))
    assert nz_cells <= sparse_cells


def test_sparse_to_dense_roundtrip():
    feats, coords, shape = make_inputs(seed=4)
    st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape)
    d = np.asarray(sparse_to_dense(st))
    want = dense_from(feats, coords, shape, 4)
    np.testing.assert_allclose(d, want, atol=1e-6)

    imap = np.asarray(dense_index_map(st))
    oc = np.asarray(st.coords)
    for i in range(len(oc)):
        if (oc[i] >= 0).all():
            assert imap[oc[i][0], oc[i][1], oc[i][2], oc[i][3]] == i
