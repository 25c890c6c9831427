#!/usr/bin/env python
"""Benchmark the flexible evaluator at validation-set scale.

VERDICT r1 weak #5: eval had never been run at realistic frame counts.
Generates KITTI-val-scale synthetic detections (default 3769 frames x 3
classes, ~12 gts and ~25 dets per frame), runs ``eval_map_flexible`` with
the native C++ affinity+matcher (set ``MMDET3D_TPU_REQUIRE_NATIVE=1`` to
refuse the numpy fallback) and prints the wall time + mAP.

Usage: python tools/misc/bench_eval.py [--frames 3769] [--nproc 4]
"""
import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
os.environ.setdefault('MMDET3D_TPU_REQUIRE_NATIVE', '1')

import numpy as np


def synth_frame(rng, num_gt=12, num_det=25):
    ctr = np.c_[rng.uniform(0, 70, (num_gt, 1)),
                rng.uniform(-40, 40, (num_gt, 1)),
                rng.uniform(-2, 0, (num_gt, 1))]
    dims = rng.uniform([1.5, 0.5, 1.4], [4.5, 2.0, 1.8], (num_gt, 3))
    yaw = rng.uniform(-np.pi, np.pi, (num_gt, 1))
    gt = np.c_[ctr, dims, yaw].astype(np.float32)
    labels = rng.randint(0, 3, num_gt).astype(np.int64)

    # detections: jittered copies of gts + clutter; per-class (N, 8) lists
    base = gt[rng.randint(0, num_gt, num_det)]
    det = base + rng.normal(0, 0.15, base.shape).astype(np.float32)
    det_labels = rng.randint(0, 3, num_det)
    scores = rng.uniform(0.05, 1.0, (num_det, 1)).astype(np.float32)
    det8 = np.concatenate([det, scores], -1)
    per_class = [det8[det_labels == c] for c in range(3)]
    return per_class, dict(gt_bboxes=gt, gt_labels=labels, gt_attrs={})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=3769)
    ap.add_argument('--nproc', type=int, default=4)
    args = ap.parse_args()

    import mmdet3d_gaussian_tpu  # noqa: F401
    from mmdet3d_gaussian_tpu.core.evaluation import native
    from mmdet3d_gaussian_tpu.core.evaluation.mean_ap import eval_map_flexible

    assert native.available(), 'native eval path must be engaged'
    rng = np.random.RandomState(0)
    results, annos = [], []
    for _ in range(args.frames):
        r, a = synth_frame(rng)
        results.append(r)
        annos.append(a)

    t0 = time.perf_counter()
    rep = eval_map_flexible(
        results, annos, match_thrs=[0.5, 0.7],
        affinity_calculator=dict(type='LidarIOU3D', z_offset=0.5),
        classes=['Pedestrian', 'Cyclist', 'Car'], nproc=args.nproc,
        report_config=[('mAP', lambda k: k['breakdown'] == 'All')])
    dt = time.perf_counter() - t0
    print(f'frames={args.frames} nproc={args.nproc} wall={dt:.2f}s '
          f'({args.frames / dt:.0f} frames/s) report={rep}')


if __name__ == '__main__':
    main()
