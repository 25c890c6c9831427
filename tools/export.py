#!/usr/bin/env python
"""Export a trained detector's predict function as a StableHLO serving
bundle (see ``mmdet3d_gaussian_tpu/engine/export.py``).

Usage:
    python tools/export.py CONFIG [CHECKPOINT] --out-dir DIR \
        [--platforms tpu cpu] [--bf16]

The bundle is self-contained: a server deserializes it with jax.export and
calls it on batches matching the recorded shape contract — no framework
code needed.
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..'))
import argparse
import json


def main():
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-dir', required=True)
    p.add_argument('--platforms', nargs='+', default=None,
                   help="lowering targets, e.g. 'tpu' or 'cpu tpu' "
                        '(default: current backend)')
    p.add_argument('--bf16', action='store_true')
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()

    import jax
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.utils.config import Config
    from mmdet3d_gaussian_tpu.engine.detector import (
        CenterPointDetector, PointPillarsDetector)
    from mmdet3d_gaussian_tpu.engine.export import export_predict
    from mmdet3d_gaussian_tpu.engine.loop import (build_dataloader,
                                                  restore_checkpoint)

    cfg = Config.fromfile(args.config)
    for kv in args.cfg_options:
        k, v = kv.split('=', 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        cfg.merge_from_dict({k: v})

    model_cfg = dict(cfg.get('model') or {})
    mtype = model_cfg.pop('type', None)
    if args.bf16:
        model_cfg['compute_dtype'] = 'bfloat16'
    if mtype == 'PVRCNN':
        from mmdet3d_gaussian_tpu.engine.pvrcnn import PVRCNNDetector
        model_cfg.pop('compute_dtype', None)
        det = PVRCNNDetector(model_cfg=model_cfg,
                             rpn_head_cfg=cfg.get('head'))
    elif model_cfg.get('head_type') == 'center':
        det = CenterPointDetector(model_cfg=model_cfg,
                                  head_cfg=cfg.get('head'))
    else:
        det = PointPillarsDetector(model_cfg=model_cfg,
                                   head_cfg=cfg.get('head'))

    split = 'val' if cfg.get('data', {}).get('val') else 'train'
    ds, make_iter = build_dataloader(cfg, split)
    init_iter = make_iter(0)
    first = next(init_iter)
    init_iter.close()
    first.pop('metas', None)
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), first)
    if args.checkpoint:
        # restore target built through the same config path as training —
        # momentum_config / warmup change the opt_state tree structure
        from mmdet3d_gaussian_tpu.parallel import train_state as ts
        optimizer = ts.make_optimizer_from_cfg(cfg, total_steps=1)
        target = ts.init_state(variables['params'],
                               variables['batch_stats'], optimizer)
        state = restore_checkpoint(args.checkpoint, target)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}

    example = {k: v for k, v in first.items()}
    path = export_predict(det, variables, example, args.out_dir,
                          classes=getattr(ds, 'CLASSES', ()),
                          platforms=args.platforms)
    print('exported ->', path)


if __name__ == '__main__':
    main()
