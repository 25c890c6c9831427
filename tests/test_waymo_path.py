"""Waymo data path end to end (VERDICT r1 missing #6 / next #8).

The reference's Waymo flow is KITTI-format infos (produced upstream) +
``WaymoDatasetRev`` with a rank-0 SharedList annotation broadcast
(``/root/reference/mmdet3d_gaussian/datasets/waymo_dataset.py:8-13``) and the
waymo config's 5-dim points (x, y, z, intensity, elongation).  Here we build
a synthetic Waymo-format tree, run WaymoDataset (SharedList-backed) through
``run_training`` with eval, and check the Waymo report schema
(mAP_L_0.7 / range breakdowns) lands in the log.
"""
import json
import os
import pickle

import numpy as np
import pytest


def make_waymo_tree(root, num_frames=4, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(root / 'training' / 'velodyne_reduced', exist_ok=True)
    infos = []
    calib = dict(R0_rect=np.eye(4), Tr_velo_to_cam=np.eye(4),
                 P2=np.eye(3, 4))
    for i in range(num_frames):
        # waymo bins: x, y, z, intensity, elongation, timestamp (6 cols)
        pts = np.c_[rng.uniform(0, 25, (700, 1)),
                    rng.uniform(-12, 12, (700, 1)),
                    rng.uniform(-2, 0, (700, 1)),
                    rng.rand(700, 2),
                    np.zeros((700, 1))].astype(np.float32)
        pts.tofile(root / 'training' / 'velodyne_reduced' / f'{i:07d}.bin')
        g = 3
        loc = np.c_[rng.uniform(3, 20, (g, 1)), rng.uniform(-8, 8, (g, 1)),
                    rng.uniform(-2, -1, (g, 1))]
        dims = np.tile([4.7, 1.8, 2.1], (g, 1))        # (l, h, w) cam-frame
        annos = dict(name=np.array(['Car', 'Pedestrian', 'Cyclist']),
                     location=loc, dimensions=dims,
                     rotation_y=rng.uniform(-1, 1, g),
                     bbox=np.tile([0, 0, 100, 100], (g, 1)),
                     occluded=np.zeros(g, np.int32),
                     truncated=np.zeros(g),
                     difficulty=np.zeros(g, np.int32))
        infos.append(dict(
            point_cloud=dict(velodyne_path=f'training/velodyne/{i:07d}.bin'),
            calib=calib, annos=annos))
    with open(root / 'waymo_infos_train.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return infos


PCR = [0, -12.8, -3, 25.6, 12.8, 1]


def _waymo_cfg(root):
    from mmdet3d_gaussian_tpu.utils.config import Config
    pipeline = [
        dict(type='LoadPointsFromFile', load_dim=6, use_dim=5),
        dict(type='PointsRangeFilter', point_cloud_range=PCR),
        dict(type='ObjectRangeFilter', point_cloud_range=PCR),
        dict(type='Pad3D', num_points=1024, num_gt=8),
    ]
    train = dict(type='WaymoDataset', data_root=str(root),
                 ann_file=str(root / 'waymo_infos_train.pkl'),
                 use_shared_memory=True, pipeline=pipeline)
    return Config(dict(
        model=dict(
            voxel_size=(0.4, 0.4, 4.0), point_cloud_range=tuple(PCR),
            max_points_per_voxel=8, max_voxels_per_sample=1024,
            voxelize_mode='dynamic',
            encoder_cfg=dict(in_channels=5, feat_channels=(16,)),
            backbone_cfg=dict(in_channels=16, out_channels=(16, 32, 64),
                              layer_nums=(1, 1, 1),
                              layer_strides=(1, 2, 2)),   # waymo stride-1
            neck_cfg=dict(in_channels=(16, 32, 64),
                          out_channels=(16, 16, 16),
                          upsample_strides=(1, 2, 4)),
            head_cfg=dict(num_classes=3, num_anchors=6, feat_channels=48)),
        head=dict(test_cfg=dict(nms_pre=64, max_num=16, score_thr=0.05,
                                nms_thr=0.01, use_rotate_nms=True)),
        data=dict(samples_per_gpu=2, train=train, val=dict(train)),
        optimizer=dict(lr=1e-3),
        max_epochs=1,
    ))


def test_waymo_dataset_shared_and_pipeline(tmp_path):
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.datasets.mem_util import SharedList
    from mmdet3d_gaussian_tpu.registry import DATASETS
    make_waymo_tree(tmp_path)
    cfg = _waymo_cfg(tmp_path)
    ds = DATASETS.build(dict(cfg.data['train']))
    assert isinstance(ds.data_infos, SharedList)   # rank-0 broadcast analogue
    item = ds[0]
    assert item['points'].shape == (1024, 5)       # intensity + elongation
    assert item['gt_bboxes'].shape == (8, 7)
    # waymo class set, not the cowa 8-class
    assert tuple(ds.CLASSES) == ('Car', 'Pedestrian', 'Cyclist')


@pytest.mark.slow
def test_waymo_train_loop_with_eval(tmp_path):
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.engine.detector import PointPillarsDetector
    from mmdet3d_gaussian_tpu.engine.loop import run_training

    make_waymo_tree(tmp_path)
    cfg = _waymo_cfg(tmp_path)
    det = PointPillarsDetector(model_cfg=dict(cfg.model),
                               head_cfg=dict(cfg.head))
    work_dir = str(tmp_path / 'work')
    os.makedirs(work_dir, exist_ok=True)
    run_training(det, cfg, work_dir, max_steps=2, log_interval=1,
                 eval_interval=1)
    recs = [json.loads(l) for l in
            open(os.path.join(work_dir, 'train_log.jsonl'))]
    val = [r for r in recs if any(k.startswith('val/') for k in r)]
    assert val, recs
    # official waymo report schema: per-class L1/L2 AP/APH + means
    assert 'val/mAP_L2' in val[0], val[0]
    assert 'val/Car/L1/APH' in val[0], val[0]
    assert np.isfinite(val[0]['val/mAP_L2'])
