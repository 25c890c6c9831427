#!/usr/bin/env python
"""Trace the LOSS phase in isolation: jit det.loss on precomputed head
outputs so the per-op table contains only target assignment + loss math.

The bench's phase breakdown (fwd+loss minus fwd) says the KITTI b4 loss
phase costs ~11.7 ms (28% of the step) — this pins WHICH ops.

Env: BENCH_SCALE / BENCH_BF16 / BENCH_VOXELIZE as in bench.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    from mmdet3d_gaussian_tpu.utils import xla_tuning
    xla_tuning.enable()
    import jax
    from mmdet3d_gaussian_tpu.utils import cache as _cc
    _cc.enable()
    from mmdet3d_gaussian_tpu.engine.detector import (PointPillarsDetector,
                                                      synthetic_batch)
    from mmdet3d_gaussian_tpu.engine.timing import chain_time, make_probe

    scale = os.environ.get('BENCH_SCALE', 'kitti')
    bf16 = os.environ.get('BENCH_BF16', '0') == '1'
    mc = {}
    if bf16:
        mc['compute_dtype'] = 'bfloat16'
    mc['voxelize_mode'] = os.environ.get('BENCH_VOXELIZE', 'dynamic')
    if scale == 'waymo':
        import bench
        mc = dict(bench.WAYMO_MODEL, **mc)
        hc = bench.WAYMO_HEAD
        batch = synthetic_batch(batch_size=2, num_points=180000, num_gt=16,
                                pc_range=mc['point_cloud_range'],
                                num_feats=5)
    else:
        hc = None
        batch = synthetic_batch(batch_size=4, num_points=16384, num_gt=16)
    det = PointPillarsDetector(model_cfg=mc or None, head_cfg=hc)
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)

    outs, _ = jax.jit(det.apply_train)(variables, batch)
    outs = jax.tree_util.tree_map(lambda x: x.copy() if hasattr(x, 'copy')
                                  else x, outs)

    loss_only = jax.jit(lambda o, b: det.loss(o, b)[0])
    # grad through the loss w.r.t. head outputs: the bwd_opt phase contains
    # this transposed program too
    loss_grad = jax.jit(lambda o, b: jax.grad(
        lambda oo: det.loss(oo, b)[0])(o))

    dt = chain_time(make_probe(loss_only, outs, batch), n_lo=2, n_hi=8)
    print(f'loss fwd only: {dt*1e3:.3f} ms', flush=True)
    dtg = chain_time(make_probe(
        lambda o, b: jax.tree_util.tree_leaves(loss_grad(o, b))[0],
        outs, batch), n_lo=2, n_hi=8)
    print(f'loss fwd+bwd(outputs): {dtg*1e3:.3f} ms', flush=True)

    trace_dir = os.environ.get('PROFILE_DIR', '/tmp/jax-trace-loss')
    with jax.profiler.trace(trace_dir):
        r = None
        for _ in range(8):
            r = loss_only(outs, batch)
        float(r)
    print('trace ->', trace_dir, flush=True)

    import glob
    import subprocess
    pb = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins/profile/*/*.xplane.pb')))[-1]
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 'profile_top_ops.py'),
                    pb, '--steps', '8', '--top', '40'])


if __name__ == '__main__':
    main()
