#!/usr/bin/env python
"""Dump pipeline outputs (points + GT boxes) as .obj for visual sanity checks
(reference ``tools/misc/browse_dataset.py``; file dump instead of open3d)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--out-dir', default='work_dirs/browse')
    p.add_argument('--num', type=int, default=5)
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()

    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.utils.config import Config
    from mmdet3d_gaussian_tpu.registry import DATASETS
    from mmdet3d_gaussian_tpu.core.visualizer import show_result

    cfg = Config.fromfile(args.config)
    for kv in args.cfg_options:
        k, v = kv.split('=', 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        cfg.merge_from_dict({k: v})
    ds = DATASETS.build(dict(cfg.data['train']))
    for i in range(min(args.num, len(ds))):
        item = ds[i]
        if item is None:
            continue
        pts = item['points'][item['points_mask']]
        gts = item['gt_bboxes'][item['gt_valid']]
        path = show_result(pts, gts, None, args.out_dir, f'frame{i:04d}')
        print('wrote', path)


if __name__ == '__main__':
    main()
