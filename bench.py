"""Benchmark: points/s/chip on the flagship train step (fwd+bwd).

Measures the BASELINE.json metric — "points/s/chip (voxelize+splat+loss
fwd/bwd)" — on the KITTI PointPillars + KLD GDLoss config: dynamic
voxelization, pillar encoder, BEV scatter, SECOND+FPN, anchor targets,
Gaussian-distance loss, backward, AdamW update.  Prints ONE JSON line.

vs_baseline: ratio vs the A100 CUDA reference throughput.  The reference
repo publishes no throughput numbers (SURVEY.md §6) and no GPU is attached
here, so we report against the recorded provisional constant below (null
until a measured CUDA number lands in BASELINE.md).
"""
import json
import time

import numpy as np

A100_BASELINE_POINTS_PER_S = None  # no published/measured CUDA number yet


def main():
    import jax
    try:
        from mmdet3d_gaussian_tpu.utils import cache as _cc
        _cc.enable()
    except Exception:
        pass
    from mmdet3d_gaussian_tpu.engine.detector import (PointPillarsDetector,
                                                      synthetic_batch)
    from mmdet3d_gaussian_tpu.parallel import train_state as ts

    import os
    batch_size = int(os.environ.get('BENCH_BATCH', 4))
    num_points = int(os.environ.get('BENCH_POINTS', 16384))
    bf16 = os.environ.get('BENCH_BF16', '0') == '1'
    mode = os.environ.get('BENCH_MODE', 'train')   # train | infer
    vox = os.environ.get('BENCH_VOXELIZE', 'dynamic')  # dynamic | hard

    mc = {}
    if bf16:
        mc['compute_dtype'] = 'bfloat16'
    if vox != 'hard':
        mc['voxelize_mode'] = vox
    det = PointPillarsDetector(model_cfg=mc or None)
    batch = synthetic_batch(batch_size=batch_size, num_points=num_points,
                            num_gt=16)
    variables = det.init(jax.random.PRNGKey(0), batch)

    if mode == 'infer':
        predict = jax.jit(det.predict)
        out = predict(variables, batch)
        jax.block_until_ready(out)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = predict(variables, batch)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        points_per_s = batch_size * num_points * iters / dt
        print(json.dumps({
            'metric': 'points/s/chip (inference: voxelize+trunk+decode+NMS)',
            'value': round(points_per_s, 1),
            'unit': 'points/s',
            'vs_baseline': None,
        }))
        return

    opt = ts.make_optimizer(1e-3, total_steps=1000)
    state = ts.init_state(variables['params'], variables['batch_stats'], opt)

    def apply_fn(vs, b, train):
        return det.apply_train(vs, b)

    iters, windows = 10, 5

    if os.environ.get('BENCH_SCAN', '0') == '1':
        # One dispatch per window: lax.scan over `iters` DISTINCT batches
        # (device-resident; nothing loop-invariant to hoist).  NOTE: under
        # the experimental axon tunnel this path is pathologically slow
        # (~300s compile, ~200x slower execution than the same step
        # dispatched normally) — keep it for direct-attached hardware.
        step = ts.make_train_step(apply_fn, det.loss, opt)
        batches = [synthetic_batch(batch_size=batch_size,
                                   num_points=num_points, num_gt=16, seed=s)
                   for s in range(iters)]
        stacked = jax.device_put(jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches))

        def multi_step(st, stacked_batches):
            def body(carry, one_batch):
                new_st, metrics = step(carry, one_batch)
                return new_st, metrics['loss']
            return jax.lax.scan(body, st, stacked_batches)

        multi = jax.jit(multi_step, donate_argnums=(0,))
        state, losses0 = multi(state, stacked)
        jax.block_until_ready(losses0)
        times = []
        for _ in range(windows):
            t0 = time.perf_counter()
            state, losses0 = multi(state, stacked)
            jax.block_until_ready(losses0)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        points_per_s = batch_size * num_points * iters / dt
        print(json.dumps({
            'metric': 'points/s/chip (voxelize+splat+loss fwd/bwd, scan)',
            'value': round(points_per_s, 1),
            'unit': 'points/s',
            'vs_baseline': None,
        }))
        return

    step = jax.jit(ts.make_train_step(apply_fn, det.loss, opt),
                   donate_argnums=(0,))

    # compile + warmup
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    for _ in range(3):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics)

    # median over windows: robust to tunnel-dispatch latency spikes;
    # within a window the 10 steps are dispatched asynchronously and
    # chained by the donated state, so device execution is back-to-back.
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    points_per_s = batch_size * num_points * iters / dt
    vs = (points_per_s / A100_BASELINE_POINTS_PER_S
          if A100_BASELINE_POINTS_PER_S else None)
    print(json.dumps({
        'metric': 'points/s/chip (voxelize+splat+loss fwd/bwd)',
        'value': round(points_per_s, 1),
        'unit': 'points/s',
        'vs_baseline': vs,
    }))


if __name__ == '__main__':
    main()
