#!/usr/bin/env python
"""Inference + evaluation CLI (reference ``tools/test.py`` counterpart).

Loads a config + orbax checkpoint, runs the jitted predict function over the
val split, converts fixed-size padded detections into per-class numpy arrays,
and calls ``dataset.evaluate`` (the flexible COCO-style 3D mAP)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..'))
import argparse
import json
import os

import numpy as np

from mmdet3d_gaussian_tpu.utils import xla_tuning

xla_tuning.enable()   # must precede first backend use (see module docstring)


def parse_args():
    p = argparse.ArgumentParser(description='Test a TPU 3D detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--metric', default='kitti',
                   help="'kitti' = official Easy/Mod/Hard AP (R11+R40); "
                        "'cowa' = the reference's flexible metric")
    p.add_argument('--bf16', action='store_true',
                   help="eval with bf16 compute (the reference's fp16 wrap "
                        "analogue); BN/decode stay f32")
    p.add_argument('--out', default=None, help='dump results pkl')
    p.add_argument('--format-only', action='store_true',
                   help='dump/format results without evaluating (reference '
                        'test.py --format-only; pair with --out)')
    p.add_argument('--show-dir', default=None,
                   help='dump per-frame .obj overlays of points + '
                        'detections (reference --show-dir; headless obj '
                        'instead of open3d windows)')
    p.add_argument('--show-score-thr', type=float, default=0.3)
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def detections_to_per_class(boxes, scores, labels, valid, num_classes):
    """Padded (K, 7)/(K,)/(K,)/(K,) -> list of per-class (N, 8) arrays."""
    boxes, scores = np.asarray(boxes), np.asarray(scores)
    labels, valid = np.asarray(labels), np.asarray(valid)
    out = []
    for c in range(num_classes):
        sel = valid & (labels == c)
        out.append(np.concatenate(
            [boxes[sel][:, :7], scores[sel][:, None]],
            -1).astype(np.float32))
    return out


def main():
    args = parse_args()
    import jax
    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.utils.config import Config
    from mmdet3d_gaussian_tpu.engine.detector import (
        CenterPointDetector, PointPillarsDetector)
    from mmdet3d_gaussian_tpu.engine.loop import (build_dataloader,
                                                  restore_checkpoint)

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

    model_cfg = dict(cfg.get('model') or {})
    mtype = model_cfg.pop('type', None)
    if args.bf16:
        # the reference wraps the model with mmcv fp16; here bf16 is a
        # compute-dtype switch.  fuse-conv-bn has no TPU analogue: XLA
        # folds inference-mode BN affine math into the convs at compile
        # time, so there is nothing to fuse by hand.
        model_cfg['compute_dtype'] = 'bfloat16'
    if mtype == 'PVRCNN':
        from mmdet3d_gaussian_tpu.engine.pvrcnn import PVRCNNDetector
        model_cfg.pop('compute_dtype', None)   # PVRCNN: f32-only stack
        det = PVRCNNDetector(model_cfg=model_cfg,
                             rpn_head_cfg=cfg.get('head'))
    elif model_cfg.get('head_type') == 'center':
        det = CenterPointDetector(model_cfg=model_cfg,
                                  head_cfg=cfg.get('head'))
    else:
        det = PointPillarsDetector(model_cfg=model_cfg,
                                   head_cfg=cfg.get('head'))
    ds, make_iter = build_dataloader(cfg, 'val')

    init_iter = make_iter(0)
    first = next(init_iter)
    init_iter.close()
    first.pop('metas', None)
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), first)
    if args.checkpoint:
        # the restore target must match the saved TrainState structure,
        # including the optimizer state pytree — build it through the same
        # config path training uses (momentum_config / warmup change the
        # opt_state tree shape)
        from mmdet3d_gaussian_tpu.parallel import train_state as ts
        optimizer = ts.make_optimizer_from_cfg(cfg, total_steps=1)
        target = ts.init_state(variables['params'],
                               variables['batch_stats'], optimizer)
        state = restore_checkpoint(args.checkpoint, target)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}

    from mmdet3d_gaussian_tpu.engine.loop import detector_num_classes
    predict = jax.jit(det.predict)
    num_classes = detector_num_classes(det)
    results = []
    frame_idx = 0
    for batch in make_iter(0):
        metas = batch.pop('metas', None)
        boxes, scores, labels, valid = predict(variables, batch)
        for i in range(boxes.shape[0]):
            results.append(detections_to_per_class(
                boxes[i], scores[i], labels[i], valid[i], num_classes))
            if args.show_dir and frame_idx < len(ds):
                from mmdet3d_gaussian_tpu.core.visualizer import show_result
                sel = (np.asarray(valid[i])
                       & (np.asarray(scores[i]) >= args.show_score_thr))
                pts = np.asarray(batch['points'][i])[
                    np.asarray(batch['points_mask'][i])]
                show_result(pts, None, np.asarray(boxes[i])[sel][:, :7],
                            args.show_dir, f'frame{frame_idx:06d}')
            frame_idx += 1

    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)

    if args.format_only:
        print(f'formatted {len(results[:len(ds)])} frames'
              + (f' -> {args.out}' if args.out else ''))
        return

    report = ds.evaluate(results[:len(ds)], metric=args.metric)
    print(json.dumps({k: float(v) for k, v in report.items()}, indent=2))


if __name__ == '__main__':
    main()
