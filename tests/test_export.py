"""Serving export round trip: export_predict -> serialized StableHLO bundle
-> load_exported -> outputs identical to direct predict; plus the
tools/export.py CLI."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_e2e_pointpillars import TINY_MODEL  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_roundtrip(tmp_path):
    from mmdet3d_gaussian_tpu.engine.detector import (PointPillarsDetector,
                                                      synthetic_batch)
    from mmdet3d_gaussian_tpu.engine.export import (export_predict,
                                                    load_exported)

    det = PointPillarsDetector(model_cfg=dict(TINY_MODEL))
    batch = synthetic_batch(batch_size=2, num_points=512, num_gt=4,
                            pc_range=TINY_MODEL['point_cloud_range'])
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)

    bundle = export_predict(det, variables, batch, str(tmp_path / 'bundle'),
                            classes=('Pedestrian', 'Cyclist', 'Car'))
    assert os.path.exists(os.path.join(bundle, 'predict.stablehlo'))

    served = load_exported(bundle)
    assert served.meta['classes'] == ['Pedestrian', 'Cyclist', 'Car']
    out_served = served(batch)
    out_direct = jax.jit(det.predict)(variables, batch)
    for a, b in zip(out_served, out_direct):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # fresh inputs exercise the baked-in weights, not constant folding
    batch2 = synthetic_batch(batch_size=2, num_points=512, num_gt=4,
                             pc_range=TINY_MODEL['point_cloud_range'],
                             seed=7)
    for a, b in zip(served(batch2), jax.jit(det.predict)(variables, batch2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_export_cli(tmp_path):
    from test_train_loop import make_kitti_tree, _cfg
    make_kitti_tree(tmp_path)
    cfg = _cfg(tmp_path)
    cfg_path = tmp_path / 'cfg.py'
    d = cfg.to_dict()
    with open(cfg_path, 'w') as f:
        for k in ('model', 'head', 'data', 'optimizer'):
            f.write(f'{k} = {d[k]!r}\n')
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
    out_dir = tmp_path / 'bundle'
    r = subprocess.run(
        [sys.executable, f'{REPO}/tools/export.py', str(cfg_path),
         '--out-dir', str(out_dir), '--platforms', 'cpu'],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / 'predict.stablehlo').exists()
    assert (out_dir / 'meta.json').exists()
