"""Smoke tests for the misc CLIs (reference ``tools/misc/*``): browse_dataset
dumps pipeline .obj frames; visualize_result overlays a results pkl."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_train_loop import make_kitti_tree, _cfg  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def kitti_cfg(tmp_path):
    make_kitti_tree(tmp_path)
    cfg = _cfg(tmp_path)
    cfg.data['val'] = dict(cfg.data['train'])
    cfg_path = tmp_path / 'cfg.py'
    d = cfg.to_dict()
    with open(cfg_path, 'w') as f:
        for k in ('model', 'head', 'data', 'optimizer'):
            f.write(f'{k} = {d[k]!r}\n')
    return tmp_path, cfg_path


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=env, timeout=300)


def test_browse_dataset_cli(kitti_cfg, tmp_path):
    root, cfg_path = kitti_cfg
    out_dir = tmp_path / 'browse'
    r = _run([f'{REPO}/tools/misc/browse_dataset.py', str(cfg_path),
              '--out-dir', str(out_dir), '--num', '2'])
    assert r.returncode == 0, r.stderr[-2000:]
    objs = [f for f in os.listdir(out_dir) if f.endswith('.obj')] \
        if out_dir.exists() else \
        [f for sub in os.listdir(out_dir.parent) for f in [sub]]
    # show_result writes <out_dir>/<name>/*.obj or flat files
    found = []
    for dirpath, _, files in os.walk(out_dir):
        found += [f for f in files if f.endswith('.obj')]
    assert found, (r.stdout, list(os.walk(str(out_dir))))


def test_visualize_result_cli(kitti_cfg, tmp_path):
    root, cfg_path = kitti_cfg
    # fake results: one (N, 8) det array per class per frame
    from mmdet3d_gaussian_tpu.registry import DATASETS
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.utils.config import Config
    cfg = Config.fromfile(str(cfg_path))
    ds = DATASETS.build(dict(cfg.data['val']))
    det = np.array([[5.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0, 0.9]],
                   np.float32)
    results = [[det, det[:0], det[:0]] for _ in range(len(ds))]
    pkl = tmp_path / 'results.pkl'
    with open(pkl, 'wb') as f:
        pickle.dump(results, f)
    out_dir = tmp_path / 'vis'
    r = _run([f'{REPO}/tools/misc/visualize_result.py', str(cfg_path),
              str(pkl), '--out-dir', str(out_dir), '--num', '2',
              '--score-thr', '0.5'])
    assert r.returncode == 0, r.stderr[-2000:]
    found = []
    for dirpath, _, files in os.walk(out_dir):
        found += [f for f in files if f.endswith('.obj')]
    assert found, r.stdout


def test_test_cli_format_only_and_show_dir(kitti_cfg, tmp_path):
    """tools/test.py --format-only --show-dir (reference test.py flags):
    dumps a results pkl + per-frame .obj overlays, skips evaluation."""
    root, cfg_path = kitti_cfg
    out_pkl = tmp_path / 'res.pkl'
    show_dir = tmp_path / 'show'
    r = _run([f'{REPO}/tools/test.py', str(cfg_path),
              '--format-only', '--out', str(out_pkl),
              '--show-dir', str(show_dir), '--show-score-thr', '0.0'])
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'formatted' in r.stdout, r.stdout[-300:]
    assert out_pkl.exists()
    found = []
    for dirpath, _, files in os.walk(show_dir):
        found += [f for f in files if f.endswith('_points.obj')]
    assert found, r.stdout
