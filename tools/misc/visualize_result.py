#!/usr/bin/env python
"""Dump prediction results (pkl from tools/test.py --out) as .obj overlays
(reference ``tools/misc/visualize_result.py``)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
import argparse
import pickle

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('results', help='pkl from tools/test.py --out')
    p.add_argument('--out-dir', default='work_dirs/vis')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--num', type=int, default=5)
    args = p.parse_args()

    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.utils.config import Config
    from mmdet3d_gaussian_tpu.registry import DATASETS
    from mmdet3d_gaussian_tpu.core.visualizer import show_result

    cfg = Config.fromfile(args.config)
    ds = DATASETS.build(dict(cfg.data['val']))
    with open(args.results, 'rb') as f:
        results = pickle.load(f)
    for i in range(min(args.num, len(ds), len(results))):
        item = ds[i]
        ann = ds.get_ann_info(i)
        preds = np.concatenate([r for r in results[i]], 0)
        preds = preds[preds[:, -1] >= args.score_thr][:, :7]
        pts = item['points'][item['points_mask']] if item else None
        path = show_result(pts, ann['gt_bboxes'], preds, args.out_dir,
                           f'frame{i:04d}')
        print('wrote', path)


if __name__ == '__main__':
    main()
