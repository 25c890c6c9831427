#!/usr/bin/env python
"""Training CLI (reference ``tools/train.py`` counterpart).

Loads a python config (``--cfg-options`` nested overrides supported), builds
dataset + detector + optimizer, runs the jitted SPMD train loop over the
available chips (DP over a ``Mesh(('data',))``), checkpoints with orbax, and
optionally evaluates each ``--eval-interval`` epochs.

Multi-host: run one process per host with ``jax.distributed.initialize``
(env-driven) — the same code path; XLA handles cross-host collectives.
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..'))
import argparse
import json
import os
import time

import numpy as np

from mmdet3d_gaussian_tpu.utils import xla_tuning

xla_tuning.enable()   # must precede first backend use (see module docstring)


def parse_args():
    p = argparse.ArgumentParser(description='Train a TPU 3D detector')
    p.add_argument('config', help='config file path')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--resume-from', default=None,
                   help='full train-state resume (or cfg resume_from)')
    p.add_argument('--load-from', default=None,
                   help='weights-only warm start (or cfg load_from)')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--max-steps', type=int, default=None,
                   help='override total optimization steps')
    p.add_argument('--eval-interval', type=int, default=None,
                   help='epochs between val runs (default: cfg evaluation.interval)')
    p.add_argument('--log-interval', type=int, default=None,
                   help='steps between log lines (default: cfg log_config.interval)')
    p.add_argument('--profile-steps', type=int, nargs=2, default=None,
                   metavar=('START', 'STOP'),
                   help='capture a jax.profiler trace between these steps')
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='key=value nested config overrides')
    p.add_argument('--distributed', action='store_true',
                   help='call jax.distributed.initialize() (multi-host)')
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        import jax
        jax.distributed.initialize()
    import jax
    import jax.numpy as jnp
    import mmdet3d_gaussian_tpu  # noqa: F401 (registers everything)
    from mmdet3d_gaussian_tpu.utils.config import Config
    from mmdet3d_gaussian_tpu.engine.detector import (
        CenterPointDetector, PointPillarsDetector)
    from mmdet3d_gaussian_tpu.engine.loop import (build_dataloader,
                                                  run_training)

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        opts = {}
        for kv in args.cfg_options:
            k, v = kv.split('=', 1)
            try:
                v = json.loads(v)
            except json.JSONDecodeError:
                pass
            opts[k] = v
        cfg.merge_from_dict(opts)

    work_dir = args.work_dir or cfg.get(
        'work_dir', os.path.join('work_dirs',
                                 os.path.splitext(
                                     os.path.basename(args.config))[0]))
    os.makedirs(work_dir, exist_ok=True)

    mcfg = dict(cfg.get('model') or {})
    mtype = mcfg.pop('type', None)
    if mtype == 'PVRCNN':
        from mmdet3d_gaussian_tpu.engine.pvrcnn import PVRCNNDetector
        det = PVRCNNDetector(model_cfg=mcfg, rpn_head_cfg=cfg.get('head'))
    elif mcfg.get('head_type') == 'center':
        det = CenterPointDetector(model_cfg=mcfg, head_cfg=cfg.get('head'))
    else:
        det = PointPillarsDetector(model_cfg=mcfg, head_cfg=cfg.get('head'))
    run_training(det, cfg, work_dir, seed=args.seed,
                 max_steps=args.max_steps, resume_from=args.resume_from,
                 load_from=args.load_from,
                 eval_interval=args.eval_interval,
                 log_interval=args.log_interval,
                 profile_steps=tuple(args.profile_steps)
                 if args.profile_steps else None)


if __name__ == '__main__':
    main()
