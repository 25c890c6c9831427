"""Integration: synthetic KITTI on disk -> dataset -> pipeline -> training
loop -> checkpoint save/restore (the tools/train.py path end to end)."""
import os
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def make_kitti_tree(root, num_frames=6, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(root / 'training' / 'velodyne_reduced', exist_ok=True)
    infos = []
    calib = dict(R0_rect=np.eye(4), Tr_velo_to_cam=np.eye(4),
                 P2=np.eye(3, 4))
    for i in range(num_frames):
        pts = np.c_[rng.uniform(0, 25, (800, 1)),
                    rng.uniform(-12, 12, (800, 1)),
                    rng.uniform(-2, 0, (800, 1)),
                    rng.rand(800, 1)].astype(np.float32)
        pts.tofile(root / 'training' / 'velodyne_reduced' / f'{i:06d}.bin')
        g = 3
        # camera-frame annos that map back to lidar via identity calib:
        # cam (x,y,z) = lidar (x,y,z); dims (l,h,w); yaw = -r - pi/2
        loc = np.c_[rng.uniform(3, 20, (g, 1)), rng.uniform(-8, 8, (g, 1)),
                    rng.uniform(-2, -1, (g, 1))]
        dims = np.tile([3.9, 1.56, 1.6], (g, 1))
        annos = dict(name=np.array(['Car'] * g),
                     location=loc, dimensions=dims,
                     rotation_y=rng.uniform(-1, 1, g),
                     bbox=np.tile([0, 0, 100, 100], (g, 1)),
                     occluded=np.zeros(g, np.int32),
                     truncated=np.zeros(g),
                     difficulty=np.zeros(g, np.int32))
        infos.append(dict(
            point_cloud=dict(velodyne_path=f'training/velodyne/{i:06d}.bin'),
            calib=calib, annos=annos))
    with open(root / 'kitti_infos_train.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return infos


@pytest.fixture()
def kitti_root(tmp_path):
    make_kitti_tree(tmp_path)
    return tmp_path


def _cfg(root):
    from mmdet3d_gaussian_tpu.utils.config import Config
    pcr = [0, -12.8, -3, 25.6, 12.8, 1]
    return Config(dict(
        model=dict(
            voxel_size=(0.4, 0.4, 4.0), point_cloud_range=tuple(pcr),
            max_points_per_voxel=8, max_voxels_per_sample=1024,
            encoder_cfg=dict(in_channels=4, feat_channels=(16,)),
            backbone_cfg=dict(in_channels=16, out_channels=(16, 32, 64),
                              layer_nums=(1, 1, 1), layer_strides=(2, 2, 2)),
            neck_cfg=dict(in_channels=(16, 32, 64),
                          out_channels=(16, 16, 16),
                          upsample_strides=(1, 2, 4)),
            head_cfg=dict(num_classes=3, num_anchors=6, feat_channels=48)),
        head=dict(test_cfg=dict(nms_pre=64, max_num=16, score_thr=0.05,
                                nms_thr=0.01, use_rotate_nms=True)),
        data=dict(
            samples_per_gpu=2,
            train=dict(type='KittiDataset', data_root=str(root),
                       ann_file=str(root / 'kitti_infos_train.pkl'),
                       pipeline=[
                           dict(type='LoadPointsFromFile', load_dim=4,
                                use_dim=4),
                           dict(type='PointsRangeFilter',
                                point_cloud_range=pcr),
                           dict(type='ObjectRangeFilter',
                                point_cloud_range=pcr),
                           dict(type='Pad3D', num_points=1024, num_gt=8),
                       ])),
        optimizer=dict(lr=1e-3),
        max_epochs=1,
    ))


def test_dataset_pipeline(kitti_root):
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.registry import DATASETS
    cfg = _cfg(kitti_root)
    ds = DATASETS.build(dict(cfg.data['train']))
    assert len(ds) == 6
    item = ds[0]
    assert item['points'].shape == (1024, 4)
    assert item['gt_bboxes'].shape == (8, 7)
    assert item['gt_valid'].sum() >= 1
    # gt dims survived cam->lidar conversion: (l, w, h) -> dx, dy, dz
    gt = item['gt_bboxes'][item['gt_valid']]
    np.testing.assert_allclose(gt[:, 3], 3.9, atol=1e-4)
    np.testing.assert_allclose(gt[:, 4], 1.6, atol=1e-4)
    np.testing.assert_allclose(gt[:, 5], 1.56, atol=1e-4)


def test_run_training_and_checkpoint(kitti_root, tmp_path):
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.engine.detector import PointPillarsDetector
    from mmdet3d_gaussian_tpu.engine.loop import (restore_checkpoint,
                                                  run_training)
    from mmdet3d_gaussian_tpu.parallel import train_state as ts

    cfg = _cfg(kitti_root)
    det = PointPillarsDetector(model_cfg=dict(cfg.model),
                               head_cfg=dict(cfg.head))
    work_dir = str(tmp_path / 'work')
    os.makedirs(work_dir, exist_ok=True)
    state = run_training(det, cfg, work_dir, max_steps=3, log_interval=1)
    assert int(state.step) == 3
    # a checkpoint + train log exist
    ckpts = [d for d in os.listdir(work_dir) if d.startswith('ckpt_')]
    assert ckpts, os.listdir(work_dir)
    assert os.path.exists(os.path.join(work_dir, 'train_log.jsonl'))

    # restore roundtrip
    restored = restore_checkpoint(
        os.path.join(work_dir, ckpts[0]), state)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_training_with_eval(kitti_root, tmp_path):
    """run_training with eval_interval: val mAP lands in the log."""
    import json as _json
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.engine.detector import PointPillarsDetector
    from mmdet3d_gaussian_tpu.engine.loop import run_training

    cfg = _cfg(kitti_root)
    cfg.data['val'] = dict(cfg.data['train'])
    det = PointPillarsDetector(model_cfg=dict(cfg.model),
                               head_cfg=dict(cfg.head))
    work_dir = str(tmp_path / 'work_eval')
    os.makedirs(work_dir, exist_ok=True)
    run_training(det, cfg, work_dir, max_steps=2, log_interval=1,
                 eval_interval=1)
    recs = [_json.loads(l) for l in
            open(os.path.join(work_dir, 'train_log.jsonl'))]
    val_recs = [r for r in recs if any(k.startswith('val/') for k in r)]
    assert val_recs, recs
    assert np.isfinite(val_recs[0]['val/mAP'])


def test_tools_test_cli(kitti_root, tmp_path):
    """The full tools/test.py CLI path: train 2 steps -> checkpoint ->
    test.py restores and evaluates."""
    import subprocess
    import sys
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.engine.detector import PointPillarsDetector
    from mmdet3d_gaussian_tpu.engine.loop import run_training

    cfg = _cfg(kitti_root)
    cfg.data['val'] = dict(cfg.data['train'])
    # cyclic momentum + warmup change the opt_state pytree structure; the
    # restore target in tools/test.py must rebuild the SAME structure
    # (regression: it used to rebuild a plain-adam optimizer and fail)
    mom = dict(policy='cyclic', target_ratio=(0.85 / 0.95, 1),
               cyclic_times=1, step_ratio_up=0.4)
    warm = dict(warmup_iters=10)
    cfg.momentum_config = mom
    cfg.warmup = warm
    det = PointPillarsDetector(model_cfg=dict(cfg.model),
                               head_cfg=dict(cfg.head))
    work_dir = str(tmp_path / 'work_cli')
    os.makedirs(work_dir, exist_ok=True)
    run_training(det, cfg, work_dir, max_steps=2, log_interval=1)
    ckpt = sorted(d for d in os.listdir(work_dir)
                  if d.startswith('ckpt_'))[-1]

    # write the config as a python file for the CLI
    cfg_path = tmp_path / 'cfg.py'
    with open(cfg_path, 'w') as f:
        f.write(f'model = {dict(cfg.model)!r}\n')
        f.write(f'head = {dict(cfg.head)!r}\n')
        f.write(f'data = {cfg.to_dict()["data"]!r}\n')
        f.write('optimizer = dict(lr=1e-3)\n')
        f.write(f'momentum_config = {mom!r}\n')
        f.write(f'warmup = {warm!r}\n')

    env = dict(os.environ, JAX_PLATFORMS='cpu',
               PYTHONPATH='/root/repo')
    out = subprocess.run(
        [sys.executable, '/root/repo/tools/test.py', str(cfg_path),
         os.path.join(work_dir, ckpt)],
        capture_output=True, text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    # default metric is now the official KITTI protocol (AP11/AP40 report)
    assert 'AP11' in out.stdout, out.stdout[-500:]
