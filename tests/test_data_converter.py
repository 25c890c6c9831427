"""Converter round trip: raw KITTI tree -> create_kitti_infos ->
KittiDataset -> create_groundtruth_database -> DataBaseSampler.

The converters are the framework's real-data entry point (reference
``tools/data_converter/kitti_converter.py`` / ``create_gt_database.py``);
this builds an actual raw tree (velodyne bins, calib txts, label_2 txts,
planes) and drives the full chain.
"""
import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools', 'data_converter'))

CALIB = """P0: 700 0 600 0 0 700 180 0 0 0 1 0
P1: 700 0 600 0 0 700 180 0 0 0 1 0
P2: 700 0 600 0 0 700 180 0 0 0 1 0
P3: 700 0 600 0 0 700 180 0 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0
"""

# cam coords of a car at lidar (10, 0, -0.22): x_c=-y_l, y_c=-z_l, z_c=x_l.
# KITTI location is the box BOTTOM in cam coords (y down): bottom z_l =
# -0.22 - 1.56/2 = -1.0 -> y_c = 1.0.  bbox height 200 px / occ 0 / trunc 0
# -> difficulty easy (0).
LABEL = "Car 0.0 0 -1.57 100 100 300 300 1.56 1.6 3.9 0 1.0 10 -1.57\n"


def make_raw_kitti(root, num_frames=3, seed=0):
    rng = np.random.RandomState(seed)
    for sub in ('velodyne', 'calib', 'label_2', 'planes'):
        os.makedirs(root / 'training' / sub, exist_ok=True)
    for i in range(num_frames):
        idx = f'{i:06d}'
        # cloud: blob on the car + forward-FOV background
        car = rng.uniform(-1, 1, (150, 3)) * [1.9, 0.8, 0.7] \
            + [10, 0, -0.25]
        bg = np.c_[rng.uniform(3, 30, (400, 1)),
                   rng.uniform(-8, 8, (400, 1)),
                   rng.uniform(-1.5, 0.5, (400, 1))]
        pts = np.concatenate([car, bg]).astype(np.float32)
        pts = np.c_[pts, rng.rand(len(pts), 1).astype(np.float32)]
        pts.tofile(root / 'training' / 'velodyne' / f'{idx}.bin')
        (root / 'training' / 'calib' / f'{idx}.txt').write_text(CALIB)
        (root / 'training' / 'label_2' / f'{idx}.txt').write_text(LABEL)
        (root / 'training' / 'planes' / f'{idx}.txt').write_text(
            '# plane\nWidth 4\nHeight 1\n0 -1 0 1.65\n')
    return root


def test_converter_roundtrip(tmp_path):
    import mmdet3d_gaussian_tpu  # noqa: F401
    import kitti_converter as kc
    from create_gt_database import create_groundtruth_database
    from mmdet3d_gaussian_tpu.registry import DATASETS

    root = make_raw_kitti(tmp_path)
    infos = kc.create_kitti_infos(str(root), 'training', save_reduced=True)
    assert len(infos) == 3
    a = infos[0]['annos']
    assert list(a['name']) == ['Car']
    assert a['difficulty'][0] == 0, a['difficulty']
    assert a['num_points_in_gt'][0] > 50, a['num_points_in_gt']
    assert np.allclose(infos[0]['plane'], [0, -1, 0, 1.65])
    # reduced clouds written and non-empty (car is inside the camera FOV)
    red = root / 'training' / 'velodyne_reduced' / '000000.bin'
    assert red.exists()
    assert np.fromfile(red, np.float32).reshape(-1, 4).shape[0] > 100

    info_path = root / 'kitti_infos_train.pkl'
    with open(info_path, 'wb') as f:
        pickle.dump(infos, f)

    # dataset loads converter output end to end
    pcr = [0, -12.8, -3, 25.6, 12.8, 1]
    ds = DATASETS.build(dict(
        type='KittiDataset', data_root=str(root), ann_file=str(info_path),
        pipeline=[
            dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
            dict(type='PointsRangeFilter', point_cloud_range=pcr),
            dict(type='Pad3D', num_points=1024, num_gt=8),
        ]))
    item = ds[0]
    box = item['gt_bboxes'][item['gt_valid']][0]
    np.testing.assert_allclose(box[:3], [10, 0, -1.0], atol=1e-3)
    np.testing.assert_allclose(box[3:6], [3.9, 1.6, 1.56], atol=1e-5)

    # GT database + sampler
    db_path = create_groundtruth_database(str(root), str(info_path),
                                          out_dir=str(root))
    with open(db_path, 'rb') as f:
        db = pickle.load(f)
    assert 'Car' in db and len(db['Car']) == 3
    patch = np.fromfile(root / db['Car'][0]['path'],
                        np.float32).reshape(-1, 4)
    assert len(patch) == db['Car'][0]['num_points_in_gt'] > 50
    # patches are center-relative
    assert np.abs(patch[:, :3]).max() < 3.0

    from mmdet3d_gaussian_tpu.datasets.dbsampler import DataBaseSampler
    sampler = DataBaseSampler(
        info_path=str(db_path), data_root=str(root), rate=1.0,
        prepare=dict(filter_by_min_points=dict(Car=5)),
        sample_groups=dict(Car=2),
        classes=['Pedestrian', 'Cyclist', 'Car'],
        points_loader=dict(load_dim=4, use_dim=4), seed=0)
    res = sampler.sample_all(np.zeros((0, 7), np.float32),
                             np.zeros((0,), np.int64))
    # all db patches share one location, so collision avoidance admits
    # exactly one of the two requested samples
    assert res is not None and len(res['gt_bboxes']) == 1
    assert (res['gt_labels'] == 2).all()
    assert len(res['points']) > 0


def test_difficulty_assignment_matches_reference():
    """KITTI easy/moderate/hard protocol parity vs the reference converter
    run from source (``kitti_data_utils.py:491-533``): strict h > min
    height, occlusion/truncation ceilings, XOR banding, -1 for none —
    including exact-boundary rows (h == 40/25 px, t == 0.15/0.3/0.5)."""
    import importlib.util
    import types

    sys.path.insert(0, '/root/repo')
    from tools.data_converter.kitti_converter import assign_difficulty

    # load the reference module with skimage stubbed + np.bool shimmed
    saved = {k: sys.modules.get(k) for k in ('skimage', 'skimage.io')}
    sk = types.ModuleType('skimage')
    sk.io = types.ModuleType('skimage.io')
    sys.modules.update({'skimage': sk, 'skimage.io': sk.io})
    had_bool = hasattr(np, 'bool')
    if not had_bool:
        np.bool = np.bool_   # removed in numpy>=1.24; the ref file uses it
    try:
        spec = importlib.util.spec_from_file_location(
            'ref_kitti_data_utils',
            '/root/reference/tools/data_converter/kitti_data_utils.py')
        ref_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_mod)
    finally:
        if not had_bool:
            del np.bool
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    rng = np.random.RandomState(5)
    n = 400
    heights = np.r_[rng.uniform(10, 80, n - 6),
                    [40.0, 25.0, 39.99, 40.01, 24.99, 25.01]]
    occ = rng.randint(0, 4, n)
    trunc = np.r_[rng.uniform(0, 0.8, n - 3), [0.15, 0.3, 0.5]]
    rng.shuffle(trunc)
    bbox = np.c_[np.zeros(n), np.full(n, 100.0),
                 np.full(n, 50.0), 100.0 + heights]
    annos = dict(name=np.array(['Car'] * n), bbox=bbox,
                 dimensions=rng.rand(n, 3), occluded=occ,
                 truncated=trunc)

    ref_diff = np.asarray(
        ref_mod.add_difficulty_to_annos(dict(annos={
            'dimensions': annos['dimensions'], 'bbox': bbox,
            'occluded': occ, 'truncated': trunc})), np.int32)
    ours = assign_difficulty(dict(annos))['difficulty']
    np.testing.assert_array_equal(ours, ref_diff)
