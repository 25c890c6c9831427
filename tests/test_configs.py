"""Every shipped config must load, inherit its _base_, and carry the keys
the train CLI consumes (rot protection for configs/)."""
import glob
import os.path as osp

import pytest

from mmdet3d_gaussian_tpu.utils.config import Config

ROOT = osp.join(osp.dirname(__file__), '..', 'configs')
CONFIGS = sorted(
    glob.glob(osp.join(ROOT, '*', '*.py')))


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
