"""Every shipped config must load, inherit its _base_, and carry the keys
the train CLI consumes (rot protection for configs/)."""
import glob
import os.path as osp

import pytest

from mmdet3d_gaussian_tpu.utils.config import Config

ROOT = osp.join(osp.dirname(__file__), '..', 'configs')
CONFIGS = sorted(
    p for p in glob.glob(osp.join(ROOT, '*', '*.py'))
    if osp.basename(osp.dirname(p)) != '_base_')   # leaves only


@pytest.mark.parametrize('path', CONFIGS, ids=[osp.basename(p)
                                               for p in CONFIGS])
def test_config_loads(path):
    cfg = Config.fromfile(path)
    assert 'model' in cfg, path
    assert 'data' in cfg and 'train' in cfg.data, path
    # every dataset cfg names a registered type and a pipeline (possibly
    # under a RepeatDataset / CBGSDataset wrapper, like the reference)
    train = cfg.data['train']
    assert 'type' in train, path
    if train['type'] in ('RepeatDataset', 'CBGSDataset'):
        train = train['dataset']
    assert 'type' in train and 'pipeline' in train, path
    # loss config sanity on GD configs: the loss type must be registered
    head = cfg.get('head', {})
    loss_dec = (head or {}).get('loss_decoded_bbox')
    if loss_dec:
        from mmdet3d_gaussian_tpu.registry import LOSSES
        assert loss_dec['type'] in LOSSES, loss_dec


def test_config_count():
    assert len(CONFIGS) >= 12, CONFIGS


def test_runtime_keys_from_default_runtime():
    """Reference default_runtime.py keys arrive as CONFIG keys (VERDICT r2
    missing #2): checkpoint_config / log_config / evaluation / load_from /
    resume_from / workflow."""
    cfg = Config.fromfile(osp.join(
        ROOT, 'kitti',
        'hv_pointpillars_secfpn_kld5tau1_12x4_160e_kitti-3d-3class.py'))
    assert cfg.checkpoint_config['interval'] == 1
    assert cfg.log_config['interval'] == 50
    assert cfg.evaluation['interval'] == 0
    assert cfg.load_from is None and cfg.resume_from is None
    assert cfg.workflow == [('train', 1)]


def test_waymo_uses_factored_base_files():
    """Waymo leaves inherit the factored _base_ model + schedule_2x files
    and resolve to the same values the inlined round-2 configs carried."""
    cfg = Config.fromfile(osp.join(
        ROOT, 'waymo',
        'hv_pointpillars_secfpn_gwd5_sbn_8x4_2x_waymo-3d-3class.py'))
    assert cfg.model['voxelize_mode'] == 'hard'
    assert cfg.model['max_voxels_per_sample'] == 32000
    assert cfg.head['anchor_generator']['aligned'] is True
    assert cfg.max_epochs == 24
    assert cfg.lr_config['policy'] == 'step'
    assert cfg.lr_config['step'] == [20, 23]
    assert cfg.optimizer['lr'] == 0.001


def test_step_lr_policy_schedule():
    """lr_config policy='step' + linear warmup builds the schedule_2x LR:
    warmup_ratio x base at step 0, base after warmup, gamma decay at the
    epoch milestones."""
    from mmdet3d_gaussian_tpu.parallel.train_state import (
        make_lr_schedule_from_cfg)
    cfg = Config({'optimizer': dict(lr=0.001),
                  'lr_config': dict(policy='step', warmup='linear',
                                    warmup_iters=10, warmup_ratio=0.1,
                                    step=[2, 3]),
                  'max_epochs': 4})
    sched = make_lr_schedule_from_cfg(cfg, total_steps=400,
                                      steps_per_epoch=100)
    assert float(sched(0)) == pytest.approx(1e-4)          # 0.1 x base
    assert float(sched(5)) == pytest.approx(0.55e-3)       # mid warmup
    assert float(sched(10)) == pytest.approx(1e-3)         # warmed up
    assert float(sched(150)) == pytest.approx(1e-3)        # epoch 1
    assert float(sched(250)) == pytest.approx(1e-4)        # after epoch 2
    assert float(sched(350)) == pytest.approx(1e-5)        # after epoch 3
    # cyclic configs return None (cyclic default built in make_optimizer)
    assert make_lr_schedule_from_cfg(
        Config({'lr_config': dict(policy='cyclic')}), 100) is None


def test_car_config_builds_detector():
    from mmdet3d_gaussian_tpu.engine.detector import PointPillarsDetector
    cfg = Config.fromfile(osp.join(
        ROOT, 'kitti', 'hv_pointpillars_secfpn_12x4_160e_kitti-3d-car.py'))
    det = PointPillarsDetector(model_cfg=dict(cfg.model),
                               head_cfg=dict(cfg.head))
    assert det.head.num_classes == 1
    h, w = det.featmap_size
    assert det.anchors.shape == (h, w, 1, 2, 7)
    assert float(det.anchors[0, 0, 0, 0, 3]) == pytest.approx(3.9)


def test_pvrcnn_config_builds_detector():
    from mmdet3d_gaussian_tpu.engine.pvrcnn import PVRCNNDetector
    cfg = Config.fromfile(osp.join(
        ROOT, 'kitti', 'hv_pvrcnn_secfpn_4x4_80e_kitti-3d-3class.py'))
    mcfg = dict(cfg.model)
    assert mcfg.pop('type') == 'PVRCNN'
    det = PVRCNNDetector(model_cfg=mcfg, rpn_head_cfg=dict(cfg.head))
    assert det.rpn_head.num_classes == 3
    assert det.cfg['num_proposals'] == 128
