"""Data plane tests: pipeline transforms, padding/collate, shared memory
store, GT-database sampler."""
import os
import pickle

import numpy as np
import pytest

from mmdet3d_gaussian_tpu.datasets.mem_util import SharedDictOfList, SharedList
from mmdet3d_gaussian_tpu.datasets.dbsampler import (BatchSampler,
                                                     DataBaseSampler)
from mmdet3d_gaussian_tpu.datasets.pipelines import (Compose,
                                                     GlobalRotScaleTrans,
                                                     LabelIDMap,
                                                     NormalizeIntensityTanh,
                                                     ObjectRangeFilter, Pad3D,
                                                     PointsRangeFilter,
                                                     RandomFlip3D,
                                                     collate_batch)


def sample_results(n=500, g=6, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        points=np.c_[rng.uniform(0, 60, (n, 1)), rng.uniform(-30, 30, (n, 1)),
                     rng.uniform(-2, 0, (n, 1)),
                     rng.rand(n, 1)].astype(np.float32),
        gt_bboxes=np.c_[rng.uniform(5, 55, (g, 1)),
                        rng.uniform(-25, 25, (g, 1)),
                        rng.uniform(-2, -1, (g, 1)),
                        rng.uniform(1, 4, (g, 3)),
                        rng.uniform(-3, 3, (g, 1))].astype(np.float32),
        gt_labels=rng.randint(0, 3, g).astype(np.int64))


def test_range_filters():
    r = sample_results()
    r = PointsRangeFilter([0, -20, -3, 40, 20, 1])(r)
    p = r['points']
    assert (p[:, 0] >= 0).all() and (p[:, 0] < 40).all()
    assert (np.abs(p[:, 1]) <= 20).all()
    r = ObjectRangeFilter([0, -20, -3, 40, 20, 1])(r)
    gt = r['gt_bboxes']
    assert (gt[:, 0] < 40).all() and (np.abs(gt[:, 1]) < 20).all()
    assert len(gt) == len(r['gt_labels'])


def test_flip_consistency():
    r = sample_results(seed=1)
    pts0 = r['points'].copy()
    gt0 = r['gt_bboxes'].copy()
    t = RandomFlip3D(flip_ratio_bev_horizontal=1.0, seed=0)
    r = t(r)
    np.testing.assert_allclose(r['points'][:, 1], -pts0[:, 1])
    np.testing.assert_allclose(r['gt_bboxes'][:, 1], -gt0[:, 1])
    np.testing.assert_allclose(r['gt_bboxes'][:, 6], -gt0[:, 6])


def test_rot_scale_preserves_relative_geometry():
    r = sample_results(seed=2)
    # place a point exactly at a gt center: must remain at the center
    r['points'][0, :3] = r['gt_bboxes'][0, :3]
    t = GlobalRotScaleTrans(rot_range=(-0.5, 0.5),
                            scale_ratio_range=(0.9, 1.1),
                            translation_std=(0.2, 0.2, 0.2), seed=3)
    r = t(r)
    np.testing.assert_allclose(r['points'][0, :3], r['gt_bboxes'][0, :3],
                               atol=1e-5)


def test_intensity_tanh():
    r = sample_results(seed=3)
    i0 = r['points'][:, 3].copy()
    r = NormalizeIntensityTanh(pre_gain=2.0, post_gain=0.5)(r)
    np.testing.assert_allclose(r['points'][:, 3], 0.5 * np.tanh(2.0 * i0),
                               rtol=1e-6)


def test_label_id_map():
    r = sample_results(seed=4)
    r['gt_labels'] = np.array([0, 1, 2, 0, 1, 2])
    r = LabelIDMap(mapping={0: 1, 2: 0})(r)     # class 1 dropped
    assert set(r['gt_labels']) <= {0, 1}
    assert len(r['gt_bboxes']) == len(r['gt_labels']) == 4


def test_pad_and_collate():
    samples = []
    for seed in range(3):
        r = sample_results(n=300 + seed * 100, seed=seed)
        samples.append(Pad3D(num_points=512, num_gt=16)(r))
    batch = collate_batch(samples)
    assert batch['points'].shape == (3, 512, 4)
    assert batch['points_mask'].shape == (3, 512)
    assert batch['gt_bboxes'].shape == (3, 16, 7)
    assert batch['gt_valid'].sum() == 18  # 6 gts each
    # mask exactly covers the real points
    assert batch['points_mask'][0].sum() == 300


def test_compose_from_config_dicts():
    pipeline = Compose([
        dict(type='PointsRangeFilter',
             point_cloud_range=[0, -40, -3, 70, 40, 1]),
        dict(type='ObjectRangeFilter',
             point_cloud_range=[0, -40, -3, 70, 40, 1]),
        dict(type='Pad3D', num_points=256, num_gt=8),
    ])
    out = pipeline(sample_results(seed=5))
    assert out['points'].shape == (256, 4)


# ---------------------------------------------------------------- shm
def test_shared_list_roundtrip():
    data = [{'a': np.arange(5)}, 'hello', 123]
    sl = SharedList(data)
    try:
        attached = SharedList(name=sl.name)
        assert len(attached) == 3
        np.testing.assert_array_equal(attached[0]['a'], np.arange(5))
        assert attached[1] == 'hello'
        assert attached[2] == 123
    finally:
        sl.cleanup()


def test_shared_dict_of_list():
    d = SharedDictOfList({'Car': [1, 2, 3], 'Ped': ['x']})
    attached = SharedDictOfList(name=d.name)
    assert set(attached.keys()) == {'Car', 'Ped'}
    assert attached['Car'][1] == 2
    assert attached['Ped'][0] == 'x'


# ---------------------------------------------------------------- sampler
def test_dbsampler(tmp_path):
    rng = np.random.RandomState(0)
    db_infos = {'Car': [], 'Pedestrian': []}
    os.makedirs(tmp_path / 'patches', exist_ok=True)
    for cls, n, dims in (('Car', 10, [4, 1.8, 1.5]),
                         ('Pedestrian', 6, [0.8, 0.6, 1.7])):
        for i in range(n):
            pts = rng.randn(30, 4).astype(np.float32) * 0.3
            path = f'patches/{cls}_{i}.npy'
            np.save(tmp_path / path, pts)
            box = np.r_[rng.uniform(-20, 20, 2), [-1.5], dims,
                        rng.uniform(-3, 3, 1)].astype(np.float32)
            db_infos[cls].append(dict(
                name=cls, path=path, box3d_lidar=box,
                num_points_in_gt=30, difficulty=0))
    info_path = tmp_path / 'dbinfos.pkl'
    with open(info_path, 'wb') as f:
        pickle.dump(db_infos, f)

    sampler = DataBaseSampler(
        info_path=str(info_path), data_root=str(tmp_path), rate=1.0,
        prepare=dict(filter_by_min_points=dict(Car=5, Pedestrian=5)),
        sample_groups=dict(Car=5, Pedestrian=5),
        classes=['Pedestrian', 'Cyclist', 'Car'],
        points_loader=dict(load_dim=4, use_dim=4), seed=0)

    gt = np.zeros((1, 7), np.float32)
    gt[0, :2] = 100  # far away, no collisions
    out = sampler.sample_all(gt, np.array([2]))
    assert out is not None
    assert len(out['gt_bboxes']) == len(out['gt_labels'])
    assert out['points'].shape[1] == 4
    # sampled boxes must not collide with each other
    from mmdet3d_gaussian_tpu.datasets.dbsampler import _boxes_collide_bev
    coll = _boxes_collide_bev(out['gt_bboxes'], out['gt_bboxes'])
    np.fill_diagonal(coll, False)
    assert not coll.any()


def test_flip_velocity_columns():
    """9-dim boxes (nuScenes): vy flips with y, vx flips with x."""
    from mmdet3d_gaussian_tpu.datasets.pipelines import RandomFlip3D
    gt = np.array([[1., 2., -1., 4., 2., 1.5, 0.3, 0.7, -0.4]], np.float32)
    pts = np.zeros((4, 4), np.float32)
    r = dict(points=pts.copy(), gt_bboxes=gt.copy())
    RandomFlip3D(flip_ratio_bev_horizontal=1.0, seed=0)(r)
    assert r['gt_bboxes'][0, 8] == 0.4 and r['gt_bboxes'][0, 7] == 0.7
    r = dict(points=pts.copy(), gt_bboxes=gt.copy())
    RandomFlip3D(flip_ratio_bev_horizontal=0.0,
                 flip_ratio_bev_vertical=1.0, seed=0)(r)
    assert r['gt_bboxes'][0, 7] == -0.7 and r['gt_bboxes'][0, 8] == -0.4


def test_dbsampler_vel_boxes_and_objectsample_pad(tmp_path):
    """sample_all accepts 9-dim gt; ObjectSample pads sampled to 9 cols."""
    import pickle
    from mmdet3d_gaussian_tpu.datasets.dbsampler import DataBaseSampler
    from mmdet3d_gaussian_tpu.datasets.pipelines import ObjectSample
    rng = np.random.RandomState(0)
    (tmp_path / 'patches').mkdir(exist_ok=True)
    db_infos = {'Car': []}
    for i in range(6):
        pts = rng.randn(20, 4).astype(np.float32) * 0.3
        path = f'patches/car_{i}.npy'
        np.save(tmp_path / path, pts)
        box = np.r_[rng.uniform(-20, 20, 2), [-1.5], [3.9, 1.6, 1.5],
                    rng.uniform(-3, 3, 1)].astype(np.float32)
        db_infos['Car'].append(dict(name='Car', path=path, box3d_lidar=box,
                                    num_points_in_gt=20, difficulty=0))
    info_path = tmp_path / 'dbinfos.pkl'
    with open(info_path, 'wb') as f:
        pickle.dump(db_infos, f)
    sampler_cfg = dict(
        info_path=str(info_path), data_root=str(tmp_path), rate=1.0,
        prepare={}, sample_groups=dict(Car=4), classes=['Car'],
        points_loader=dict(load_dim=4, use_dim=4), seed=0)

    gt9 = np.zeros((2, 9), np.float32)
    gt9[:, :2] = [[100, 100], [-100, -100]]
    gt9[:, 3:6] = [3.9, 1.6, 1.5]
    sampler = DataBaseSampler(**sampler_cfg)
    out = sampler.sample_all(gt9, np.zeros(2, np.int64))
    assert out is not None and out['gt_bboxes'].shape[1] == 7

    os_t = ObjectSample(db_sampler=dict(type='DataBaseSampler',
                                        **sampler_cfg))
    r = dict(points=rng.randn(50, 4).astype(np.float32) * 30,
             gt_bboxes=gt9.copy(), gt_labels=np.zeros(2, np.int64))
    r = os_t(r)
    assert r['gt_bboxes'].shape[1] == 9        # sampled rows zero-padded
    assert len(r['gt_bboxes']) == len(r['gt_labels']) > 2


def test_object_noise_transform():
    """ObjectNoise: a box's pose is perturbed, its interior points follow
    rigidly, other points stay put, and noised boxes never collide."""
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.datasets.pipelines import ObjectNoise
    from mmdet3d_gaussian_tpu.core.evaluation.geometry_np import \
        rotated_intersection_area

    rng = np.random.RandomState(0)
    boxes = np.array([[0., 0., -1., 4., 2., 1.5, 0.2],
                      [12., 0., -1., 4., 2., 1.5, -0.4]], np.float32)
    # points: 30 inside each box + background
    pts = []
    for b in boxes:
        local = rng.uniform(-0.4, 0.4, (30, 3)) * b[3:6]
        c, s = np.cos(b[6]), np.sin(b[6])
        xy = np.c_[c * local[:, 0] - s * local[:, 1],
                   s * local[:, 0] + c * local[:, 1]]
        pts.append(np.c_[xy + b[:2], local[:, 2:3] + b[2] + b[5] / 2,
                         np.ones((30, 1))])
    bg = np.c_[rng.uniform(30, 40, (20, 2)), rng.uniform(-2, 0, (20, 1)),
               np.ones((20, 1))]
    points = np.concatenate(pts + [bg]).astype(np.float32)

    t = ObjectNoise(num_try=100, translation_std=[1.0, 1.0, 0.0],
                    global_rot_range=[0.0, 0.0],
                    rot_range=[-0.78539816, 0.78539816], seed=3)
    out = t(dict(points=points.copy(), gt_bboxes=boxes.copy(),
                 gt_labels=np.zeros(2, np.int64)))
    nb = out['gt_bboxes']
    assert not np.allclose(nb, boxes)            # poses actually changed
    # z translation std 0 -> z and dims unchanged
    np.testing.assert_allclose(nb[:, 2:6], boxes[:, 2:6], atol=1e-6)
    # interior points moved rigidly with their box: still inside, count kept
    for i in range(2):
        inside = ObjectNoise._in_box(out['points'], nb[i])
        assert inside.sum() == 30, (i, int(inside.sum()))
    # background untouched
    np.testing.assert_allclose(out['points'][-20:], bg, atol=0)
    # no collisions among noised boxes
    bev = np.c_[nb[:, 0:2], nb[:, 3:5], nb[:, 6:7]].astype(np.float64)
    inter = rotated_intersection_area(bev, bev)
    assert inter[0, 1] < 1e-9


def test_repeat_and_cbgs_wrappers():
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.datasets.other_datasets import (CBGSDataset,
                                                              RepeatDataset)

    class Stub:
        CLASSES = ('a', 'b')

        def __len__(self):
            return 4

        def __getitem__(self, idx):
            return idx

        def get_ann_info(self, idx):
            # class 1 appears only in sample 3 -> CBGS must oversample it
            labels = [np.array([0]), np.array([0]), np.array([0]),
                      np.array([0, 1])]
            return dict(gt_labels=labels[idx])

        def evaluate(self, results, **kw):
            return dict(n=len(results))

    rep = RepeatDataset(Stub(), times=3)
    assert len(rep) == 12
    assert rep[5] == 1 and rep.get_ann_info(11)['gt_labels'][-1] == 1
    assert rep.evaluate([1, 2]) == dict(n=2)

    cb = CBGSDataset(Stub(), seed=0)
    picked = [cb[i] for i in range(len(cb))]
    # the rare-class sample is drawn at a much higher rate than its 1/4
    # natural share (upstream CBGS targets 1/num_classes per class)
    frac3 = picked.count(3) / len(picked)
    assert frac3 > 0.3, (frac3, picked)
    assert cb.evaluate([1]) == dict(n=1)
