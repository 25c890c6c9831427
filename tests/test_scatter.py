"""Dynamic scatter / hard voxelization parity vs a pure-NumPy loop oracle.

Semantics under test mirror the reference CUDA kernels
(``ops/voxel/src/scatter_points_cuda.cu``): sum/mean/max reductions, mapback
gather, max-backward tie-break to the lowest point index, invalid (-1) coord
handling, and padded hard-voxelization packing.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.ops.scatter import (Scatter, batch_coords,
                                              build_scatter,
                                              compute_voxel_coords,
                                              segment_max_lowtie)
from mmdet3d_gaussian_tpu.ops.voxelize import (bev_gather, bev_scatter,
                                               dynamic_voxelize,
                                               hard_voxelize)


def make_points(n=200, seed=0, invalid_frac=0.1):
    rng = np.random.RandomState(seed)
    coords = rng.randint(0, 5, size=(n, 3)).astype(np.int32)
    inv = rng.rand(n) < invalid_frac
    coords[inv] = -1
    feats = rng.randn(n, 8).astype(np.float32)
    return coords, feats


def oracle_groups(coords):
    """dict: coord-tuple -> sorted list of point indices (valid only)."""
    groups = {}
    for i, c in enumerate(coords):
        if (c < 0).any():
            continue
        groups.setdefault(tuple(c), []).append(i)
    return groups


def test_build_scatter_structure():
    coords, feats = make_points()
    sc = build_scatter(jnp.asarray(coords), (5, 5, 5), max_voxels=128)
    groups = oracle_groups(coords)
    assert int(sc.num_voxels) == len(groups)

    ids = np.asarray(sc.point_voxel_ids)
    vcoords = np.asarray(sc.voxel_coords)
    counts = np.asarray(sc.voxel_counts)
    # every group lands in exactly one voxel row with matching coords/counts
    for c, members in groups.items():
        vids = set(ids[members])
        assert len(vids) == 1
        v = vids.pop()
        assert tuple(vcoords[v]) == c
        assert counts[v] == len(members)
    # invalid points -> trash id
    for i, c in enumerate(coords):
        if (c < 0).any():
            assert ids[i] == sc.max_voxels


@pytest.mark.parametrize('op', ['sum', 'mean', 'max'])
def test_reduce_matches_oracle(op):
    coords, feats = make_points(seed=1)
    sc = build_scatter(jnp.asarray(coords), (5, 5, 5), max_voxels=128)
    got = np.asarray(sc.reduce(jnp.asarray(feats), op))

    groups = oracle_groups(coords)
    ids = np.asarray(sc.point_voxel_ids)
    for c, members in groups.items():
        v = ids[members[0]]
        block = feats[members].astype(np.float64)
        want = {'sum': block.sum(0), 'mean': block.mean(0),
                'max': block.max(0)}[op]
        np.testing.assert_allclose(got[v], want, rtol=1e-5, atol=1e-5)
    # unused rows are zero
    counts = np.asarray(sc.voxel_counts)
    np.testing.assert_allclose(got[counts == 0], 0.0)


def test_mapback():
    coords, feats = make_points(seed=2)
    sc = build_scatter(jnp.asarray(coords), (5, 5, 5), max_voxels=128)
    vfeats = sc.reduce(jnp.asarray(feats), 'mean')
    back = np.asarray(sc.mapback(vfeats))
    ids = np.asarray(sc.point_voxel_ids)
    v = np.asarray(vfeats)
    for i in range(len(coords)):
        if (coords[i] < 0).any():
            np.testing.assert_allclose(back[i], 0.0)
        else:
            np.testing.assert_allclose(back[i], v[ids[i]], rtol=1e-6)


def test_sum_mean_grads():
    coords, feats = make_points(seed=3, invalid_frac=0.2)
    sc = build_scatter(jnp.asarray(coords), (5, 5, 5), max_voxels=128)
    x = jnp.asarray(feats)

    for op in ('sum', 'mean'):
        g = jax.grad(lambda p: jnp.sum(sc.reduce(p, op) ** 2))(x)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        # invalid points receive zero grad
        inv = (coords < 0).any(-1)
        np.testing.assert_allclose(g[inv], 0.0)


def test_max_grad_tie_break_lowest_index():
    """Two points with identical max value: grad must go to the LOWER point
    index (reference atomicMin traceback, scatter_points_cuda.cu:155-158)."""
    coords = jnp.asarray([[0, 0, 0]] * 4, dtype=jnp.int32)
    feats = jnp.asarray([[1.0], [3.0], [3.0], [2.0]])
    sc = build_scatter(coords, (1, 1, 1), max_voxels=4)

    g = jax.grad(lambda p: jnp.sum(sc.reduce(p, 'max')))(feats)
    np.testing.assert_allclose(np.asarray(g)[:, 0], [0.0, 1.0, 0.0, 0.0])


def test_segment_max_empty_segments_zero():
    data = jnp.asarray([[5.0, -2.0]])
    out = segment_max_lowtie(data, jnp.asarray([0], jnp.int32), 3)
    np.testing.assert_allclose(np.asarray(out),
                               [[5.0, -2.0], [0.0, 0.0], [0.0, 0.0]])


def test_compute_voxel_coords():
    pts = jnp.asarray([[0.05, 0.05, 0.0], [3.95, 0.05, 0.0],
                       [-1.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    coords, grid = compute_voxel_coords(pts, (0, 0, -1, 4, 4, 1),
                                        (0.1, 0.1, 2.0))
    assert tuple(np.asarray(grid)) == (40, 40, 1)
    c = np.asarray(coords)
    np.testing.assert_array_equal(c[0], [0, 0, 0])
    np.testing.assert_array_equal(c[1], [39, 0, 0])
    np.testing.assert_array_equal(c[2], [-1, -1, -1])
    np.testing.assert_array_equal(c[3], [-1, -1, -1])


def test_hard_voxelize_packing():
    coords, feats = make_points(n=100, seed=4)
    hv = hard_voxelize(jnp.asarray(feats), jnp.asarray(coords), (5, 5, 5),
                       max_points=3, max_voxels=128)
    groups = oracle_groups(coords)
    vox = np.asarray(hv.voxels)
    npts = np.asarray(hv.num_points)
    vcoords = np.asarray(hv.coords)
    ids = np.asarray(hv.scatter.point_voxel_ids)
    for c, members in groups.items():
        v = ids[members[0]]
        assert tuple(vcoords[v]) == c
        assert npts[v] == min(len(members), 3)
        # first max_points members (ascending index) fill the slots
        for slot, pt in enumerate(members[:3]):
            np.testing.assert_allclose(vox[v, slot], feats[pt])
        for slot in range(min(len(members), 3), 3):
            np.testing.assert_allclose(vox[v, slot], 0.0)


def test_batched_scatter():
    rng = np.random.RandomState(5)
    coords3 = rng.randint(0, 4, size=(50, 3)).astype(np.int32)
    coords3[:5] = -1
    batch = rng.randint(0, 2, size=(50,)).astype(np.int32)
    coords4 = np.asarray(batch_coords(jnp.asarray(coords3),
                                      jnp.asarray(batch)))
    assert coords4.shape == (50, 4)
    np.testing.assert_array_equal(coords4[:5, 0], -1)
    sc = build_scatter(jnp.asarray(coords4), (2, 4, 4, 4), max_voxels=64)
    # same (batch, coord) key -> same voxel; different batch -> different
    key = [tuple(c) for c in coords4]
    ids = np.asarray(sc.point_voxel_ids)
    for i in range(50):
        for j in range(i + 1, 50):
            if (coords4[i] < 0).any() or (coords4[j] < 0).any():
                continue
            assert (ids[i] == ids[j]) == (key[i] == key[j])


def test_bev_scatter_gather_roundtrip():
    rng = np.random.RandomState(6)
    vfeats = rng.randn(32, 16).astype(np.float32)
    # unique (b, ix, iy) coords
    all_cells = [(b, x, y) for b in range(2) for x in range(8)
                 for y in range(8)]
    rng.shuffle(all_cells)
    coords = np.asarray(all_cells[:32], dtype=np.int32)
    coords = np.concatenate([coords, np.zeros((32, 1), np.int32)], -1)
    coords[30:] = -1  # invalid rows
    canvas = bev_scatter(jnp.asarray(vfeats), jnp.asarray(coords),
                         batch_size=2, nx=8, ny=8)
    assert canvas.shape == (2, 8, 8, 16)
    back = np.asarray(bev_gather(canvas, jnp.asarray(coords)))
    np.testing.assert_allclose(back[:30], vfeats[:30], rtol=1e-6)
    np.testing.assert_allclose(back[30:], 0.0)
    # canvas total mass == sum of valid features
    np.testing.assert_allclose(np.asarray(canvas).sum(),
                               vfeats[:30].sum(), rtol=1e-4)


def test_scatter_is_jittable_and_deterministic():
    coords, feats = make_points(seed=7)

    @jax.jit
    def f(c, x):
        sc = build_scatter(c, (5, 5, 5), max_voxels=128)
        return sc.reduce(x, 'sum')

    a = f(jnp.asarray(coords), jnp.asarray(feats))
    b = f(jnp.asarray(coords), jnp.asarray(feats))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sorted_view_matches_unsorted():
    """sorted_view + permuted data must reproduce every reduce/mapback and
    the max-backward routing of the original (unsorted) Scatter."""
    coords, feats = make_points(n=300, seed=11)
    sc = build_scatter(jnp.asarray(coords), (5, 5, 5), max_voxels=96)
    sv = sc.sorted_view()
    order = np.asarray(sc.sort_order)
    f = jnp.asarray(feats)
    fs = jnp.take(f, sc.sort_order, axis=0)

    assert sv.ids_sorted and not sc.ids_sorted
    ids_s = np.asarray(sv.point_voxel_ids)
    assert (np.diff(ids_s) >= 0).all()           # ascending

    for op in ('sum', 'mean', 'max'):
        np.testing.assert_allclose(np.asarray(sc.reduce(f, op)),
                                   np.asarray(sv.reduce(fs, op)),
                                   rtol=1e-6, atol=1e-6)

    vox = sc.reduce(f, 'mean')
    mb = np.asarray(sc.mapback(vox))
    mb_s = np.asarray(sv.mapback(vox))
    np.testing.assert_allclose(mb_s, mb[order], rtol=1e-6)

    # max backward: grads routed to the same ORIGINAL points (tie-break
    # preserved because argsort is stable)
    g = jax.grad(lambda x: jnp.sum(sc.reduce(x, 'max') ** 2))(f)
    g_s = jax.grad(lambda x: jnp.sum(sv.reduce(x, 'max') ** 2))(fs)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g)[order],
                               rtol=1e-6, atol=1e-6)


def test_hard_voxelize_mask_slots_equivalence_through_pfn():
    """mask_slots=False leaves neighbor rows in invalid slots; the hard
    PFN's fmask multiply zeroes them before the MLP, so encoder outputs
    are IDENTICAL (the detector's packed path relies on this)."""
    import jax
    import jax.numpy as jnp
    from mmdet3d_gaussian_tpu.models.voxel_encoders import PillarFeatureNet
    from mmdet3d_gaussian_tpu.ops.voxelize import hard_voxelize

    rng = np.random.RandomState(0)
    n = 2000
    pts = np.c_[rng.uniform(0, 20, (n, 1)), rng.uniform(-10, 10, (n, 1)),
                rng.uniform(-2, 0, (n, 1)), rng.rand(n, 1)].astype(
                    np.float32)
    coords = np.stack([
        np.zeros(n, np.int32),
        (pts[:, 0] // 0.5).astype(np.int32),
        ((pts[:, 1] + 10) // 0.5).astype(np.int32),
        np.zeros(n, np.int32)], -1)
    enc = PillarFeatureNet(in_channels=4, feat_channels=(16,),
                           voxel_size=(0.5, 0.5, 4.0),
                           point_cloud_range=(0, -10, -2, 20, 10, 2))

    outs = []
    for mask_slots in (True, False):
        hv = hard_voxelize(jnp.asarray(pts), jnp.asarray(coords),
                           (1, 40, 40, 1), 8, 256, mask_slots=mask_slots)
        v = enc.init(jax.random.PRNGKey(0), hv.voxels, hv.coords,
                     hv.num_points)
        outs.append(np.asarray(enc.apply(v, hv.voxels, hv.coords,
                                         hv.num_points, train=False)))
    np.testing.assert_array_equal(outs[0], outs[1])
