"""nuScenes data path end to end: synthetic mmdet3d-style info pkl + bins ->
NuScenesDataset -> run_training (CenterPoint, velocity regression) with NDS
evaluation in the log.

Completes the dataset-family e2e trio (KITTI: test_train_loop, Waymo:
test_waymo_path).  Reference flow: ``nuscenes_dataset.py`` over upstream
infos; 5-dim points (x, y, z, intensity, ring), 9-DoF boxes (7 + vxy).
"""
import json
import os
import pickle

import numpy as np
import pytest

PCR = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]
CLASSES = ('car', 'pedestrian')


def make_nus_tree(root, num_frames=4, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(root / 'samples', exist_ok=True)
    infos = []
    for i in range(num_frames):
        pts = np.c_[rng.uniform(-10, 10, (800, 2)),
                    rng.uniform(-2, 0, (800, 1)),
                    rng.rand(800, 1) * 30,
                    rng.randint(0, 32, (800, 1)).astype(np.float32)]
        path = root / 'samples' / f'{i:04d}.bin'
        pts.astype(np.float32).tofile(path)
        g = 3
        boxes = np.c_[rng.uniform(-8, 8, (g, 2)),
                      rng.uniform(-2, -1, (g, 1)),
                      np.tile([4.6, 1.9, 1.7], (g, 1)),
                      rng.uniform(-np.pi, np.pi, (g, 1))].astype(np.float32)
        # previous sweeps: rotated/translated copies with older timestamps
        sweeps = []
        for s in range(2):
            spts = np.c_[rng.uniform(-10, 10, (300, 2)),
                         rng.uniform(-2, 0, (300, 1)),
                         rng.rand(300, 1) * 30,
                         np.zeros((300, 1), np.float32)]
            spath = root / 'samples' / f'{i:04d}_sweep{s}.bin'
            spts.astype(np.float32).tofile(spath)
            ang = 0.05 * (s + 1)
            rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                            [np.sin(ang), np.cos(ang), 0],
                            [0, 0, 1]], np.float32)
            sweeps.append(dict(
                data_path=str(spath),
                sensor2lidar_rotation=rot,
                sensor2lidar_translation=np.array([0.5 * (s + 1), 0, 0],
                                                  np.float32),
                timestamp=1_000_000 * (100 - (s + 1) * 0.05)))
        infos.append(dict(
            lidar_path=str(path),
            timestamp=1_000_000 * 100,
            sweeps=sweeps,
            gt_boxes=boxes,
            gt_names=np.array(['car', 'pedestrian', 'car'])[:g],
            gt_velocity=rng.uniform(-2, 2, (g, 2)).astype(np.float32),
        ))
    with open(root / 'nus_infos.pkl', 'wb') as f:
        pickle.dump(dict(infos=infos), f)
    return root


def _nus_cfg(root):
    from mmdet3d_gaussian_tpu.utils.config import Config
    pipeline = [
        dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
        dict(type='LoadPointsFromMultiSweeps', sweeps_num=2,
             use_dim=[0, 1, 2, 3, 4], pad_empty_sweeps=True,
             remove_close=True),
        dict(type='PointsRangeFilter', point_cloud_range=PCR),
        dict(type='ObjectRangeFilter', point_cloud_range=PCR),
        dict(type='Pad3D', num_points=2048, num_gt=8),
    ]
    data = dict(
        samples_per_gpu=2,
        train=dict(type='NuScenesDataset', data_root=str(root),
                   ann_file=str(root / 'nus_infos.pkl'),
                   classes=list(CLASSES), pipeline=pipeline),
    )
    data['val'] = dict(data['train'])
    return Config(dict(
        model=dict(
            voxel_size=(0.4, 0.4, 4.0), point_cloud_range=tuple(PCR),
            max_voxels_per_sample=1024, voxelize_mode='dynamic',
            head_type='center',
            encoder_cfg=dict(in_channels=5, feat_channels=(16,)),
            backbone_cfg=dict(in_channels=16, out_channels=(16, 32, 64),
                              layer_nums=(1, 1, 1), layer_strides=(2, 2, 2)),
            neck_cfg=dict(in_channels=(16, 32, 64),
                          out_channels=(16, 16, 16),
                          upsample_strides=(0.5, 1, 2))),
        head=dict(
            tasks=[dict(num_classes=1), dict(num_classes=1)],
            out_size_factor=4, with_vel=True, code_weights=None,
            max_objs=8,
            test_cfg=dict(max_per_img=16, score_threshold=0.0,
                          nms_type='rotate', nms_thr=0.2,
                          post_max_size=8)),
        data=data,
        optimizer=dict(lr=1e-3),
        max_epochs=1,
    ))


def test_nuscenes_dataset_items(tmp_path):
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.registry import DATASETS
    root = make_nus_tree(tmp_path)
    cfg = _nus_cfg(root)
    ds = DATASETS.build(dict(cfg.data['train']))
    assert len(ds) == 4
    item = ds[0]
    assert item['points'].shape == (2048, 5)
    # the aggregated cloud carries the time-lag channel; key rows = 0
    assert 0.0 in np.round(item['points'][:, 4], 3)
    # velocity columns appended: 7 box dims + vx, vy
    assert item['gt_bboxes'].shape[1] == 9
    ann = ds.get_ann_info(0)
    assert ann['gt_bboxes'].shape[1] == 9
    assert set(ann['gt_labels']) <= {0, 1}


@pytest.mark.slow
def test_nuscenes_training_with_nds_eval(tmp_path):
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.engine.detector import CenterPointDetector
    from mmdet3d_gaussian_tpu.engine.loop import run_training

    root = make_nus_tree(tmp_path)
    cfg = _nus_cfg(root)
    det = CenterPointDetector(model_cfg=dict(cfg.model),
                              head_cfg=dict(cfg.head))
    work = str(tmp_path / 'work')
    os.makedirs(work, exist_ok=True)
    run_training(det, cfg, work, max_steps=2, log_interval=1,
                 eval_interval=1)
    recs = [json.loads(l) for l in open(os.path.join(work,
                                                     'train_log.jsonl'))]
    val = [r for r in recs if any(k.startswith('val/') for k in r)]
    assert val, recs
    keys = set(val[0])
    assert 'val/NDS' in keys and 'val/mAP' in keys, keys
    assert np.isfinite(val[0]['val/NDS'])


def test_multisweep_transform_semantics():
    """LoadPointsFromMultiSweeps: ego-motion compensation, time-lag
    channel, remove_close, and empty-sweep padding (upstream mmdet3d
    semantics the reference nuScenes configs rely on)."""
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.datasets.pipelines import \
        LoadPointsFromMultiSweeps
    import tempfile

    key = np.array([[5.0, 0.0, -1.0, 0.3, 99.0],
                    [0.2, 0.2, -1.0, 0.3, 99.0]], np.float32)  # 2nd is close
    ang = np.pi / 2
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    sweep_pts = np.array([[1.0, 0.0, -1.0, 0.5, 0.0]], np.float32)
    with tempfile.NamedTemporaryFile(suffix='.bin', delete=False) as f:
        sweep_pts.tofile(f.name)
        t = LoadPointsFromMultiSweeps(sweeps_num=2, load_dim=5,
                                      use_dim=[0, 1, 2, 3, 4],
                                      remove_close=True)
        out = t(dict(points=key.copy(), timestamp=100.0,
                     sweeps=[dict(data_path=f.name,
                                  sensor2lidar_rotation=rot,
                                  sensor2lidar_translation=np.zeros(3),
                                  timestamp=99.9e6)]))['points']
    # key frame: close point dropped is NOT applied to the key frame
    # (upstream keeps all key points), lag zeroed
    assert out.shape == (3, 5)
    np.testing.assert_allclose(out[:2, 4], 0.0)
    # sweep point (1, 0, z) rotated 90deg -> (0, 1, z), lag 0.1 s
    np.testing.assert_allclose(out[2, :3], [0.0, 1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(out[2, 4], 0.1, atol=1e-6)

    # pad_empty_sweeps replicates the key frame with remove_close applied
    t2 = LoadPointsFromMultiSweeps(sweeps_num=3, load_dim=5,
                                   pad_empty_sweeps=True, remove_close=True)
    out2 = t2(dict(points=key.copy(), timestamp=100.0, sweeps=[]))['points']
    assert out2.shape == (2 + 3 * 1, 5)    # close row dropped in pads only
