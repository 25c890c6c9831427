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
    # every dataset cfg names a registered type and a pipeline
    train = cfg.data['train']
    assert 'type' in train and 'pipeline' in train, path
    # loss config sanity on GD configs: the loss type must be registered
    head = cfg.get('head', {})
    loss_dec = (head or {}).get('loss_decoded_bbox')
    if loss_dec:
        from mmdet3d_gaussian_tpu.registry import LOSSES
        assert loss_dec['type'] in LOSSES, loss_dec


def test_config_count():
    assert len(CONFIGS) >= 12, CONFIGS
