"""CowaDataset (reference ``cowa_dataset.py:10-235``): 8-class KITTI-format
dataset, RangeBreakdown evaluation, out-of-eval-range GT -> ignore."""
import os
import pickle

import numpy as np
import pytest


def make_cowa_tree(root, num_frames=4, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(root / 'training' / 'velodyne_reduced', exist_ok=True)
    calib = dict(R0_rect=np.eye(4), Tr_velo_to_cam=np.eye(4),
                 P2=np.eye(3, 4))
    infos = []
    for i in range(num_frames):
        pts = np.c_[rng.uniform(0, 60, (600, 1)),
                    rng.uniform(-20, 20, (600, 1)),
                    rng.uniform(-2, 0, (600, 1)),
                    rng.rand(600, 1)].astype(np.float32)
        pts.tofile(root / 'training' / 'velodyne_reduced' / f'{i:06d}.bin')
        # near car (in eval range), far truck (outside -> ignore), cone
        loc = np.array([[10.0, 0.0, -1.0],
                        [90.0, 0.0, -1.0],
                        [25.0, 5.0, -1.0]])
        dims = np.array([[4.5, 1.6, 1.9],     # (l, h, w)
                         [8.0, 3.0, 2.6],
                         [0.3, 0.6, 0.3]])
        annos = dict(name=np.array(['car', 'truck', 'cone']),
                     location=loc, dimensions=dims,
                     rotation_y=np.zeros(3),
                     bbox=np.tile([0, 0, 100, 100], (3, 1)),
                     occluded=np.zeros(3, np.int32),
                     truncated=np.zeros(3),
                     difficulty=np.zeros(3, np.int32))
        infos.append(dict(
            point_cloud=dict(velodyne_path=f'training/velodyne/{i:06d}.bin'),
            calib=calib, annos=annos))
    path = root / 'cowa_infos_train.pkl'
    with open(path, 'wb') as f:
        pickle.dump(infos, f)
    return path


def test_cowa_dataset_eval(tmp_path):
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.registry import DATASETS

    info_path = make_cowa_tree(tmp_path)
    ds = DATASETS.build(dict(
        type='CowaDataset', data_root=str(tmp_path),
        ann_file=str(info_path),
        eval_point_cloud_range=[0, -40, -3, 70.4, 40, 1],
        pipeline=[
            dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
            dict(type='Pad3D', num_points=1024, num_gt=8),
        ]))
    assert len(ds) == 4
    assert len(ds.CLASSES) == 8

    ann = ds.get_ann_info(0)
    # far truck (x=90) outside the eval range -> ignore flag
    ig = ann['gt_attrs']['ignore']
    names = [ds.CLASSES[l] for l in ann['gt_labels']]
    assert ig[names.index('truck')]
    assert not ig[names.index('car')]

    # perfect car + cone detections, truck NOT detected.  The truck is
    # the ignored (out-of-range) GT, so mAP must still be 1.0 — proving
    # ignore semantics — and the near bucket likewise.
    num_cls = len(ds.CLASSES)
    results = []
    for i in range(len(ds)):
        a = ds.get_ann_info(i)
        per_cls = [np.zeros((0, 8), np.float32) for _ in range(num_cls)]
        for cls in ('car', 'cone'):
            ci = ds.CLASSES.index(cls)
            det = a['gt_bboxes'][a['gt_labels'] == ci]
            per_cls[ci] = np.c_[
                det, np.full((len(det), 1), 0.9)].astype(np.float32)
        results.append(per_cls)
    rep = ds.evaluate(results)
    assert 'mAP' in rep and 'mAP_near' in rep
    assert np.isclose(rep['mAP'], 1.0), rep
    assert np.isclose(rep['mAP_near'], 1.0), rep
