#!/usr/bin/env python
"""Profile the flagship train step: H2D-transfer cost + per-op trace.

Two experiments the plain bench can't separate:

1. ``step(state, numpy_batch)`` re-transfers the host batch every call
   (JAX does not cache device buffers for numpy inputs).  Compare against
   a ``jax.device_put``'d batch to isolate the H2D cost through the axon
   tunnel — in real training the prefetcher (engine/prefetch.py) does the
   device_put on a producer thread, so the device-resident number is the
   honest steady-state step time.
2. Capture a jax.profiler trace of N chained steps and summarize with
   tools/misc/profile_top_ops.py to attribute the time per op category.

Env: BENCH_SCALE / BENCH_BF16 / BENCH_VOXELIZE as in bench.py;
PROFILE_DIR (default /tmp/jax-trace-step) for the xplane output.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    from mmdet3d_gaussian_tpu.utils import xla_tuning
    xla_tuning.enable()   # MMDET3D_TPU_NO_XLA_TUNING=1 for A/B runs
    import jax
    from mmdet3d_gaussian_tpu.utils import cache as _cc
    _cc.enable()
    from mmdet3d_gaussian_tpu.engine.detector import (PointPillarsDetector,
                                                      synthetic_batch)
    from mmdet3d_gaussian_tpu.engine.timing import chain_time_state
    from mmdet3d_gaussian_tpu.parallel import train_state as ts

    bf16 = os.environ.get('BENCH_BF16', '0') == '1'
    vox = os.environ.get('BENCH_VOXELIZE', 'dynamic')
    scale = os.environ.get('BENCH_SCALE', 'kitti')
    hc = None
    if scale == 'waymo':
        import bench as _bench
        mc = dict(_bench.WAYMO_MODEL)
        hc = dict(_bench.WAYMO_HEAD)
        bsz, npts, pcr = 2, 180000, mc['point_cloud_range']
        nfeat = 5
    else:
        mc = {}
        bsz, npts, pcr = 4, 16384, (0., -39.68, -3., 69.12, 39.68, 1.)
        nfeat = 4
    mc['voxelize_mode'] = vox
    if bf16:
        mc['compute_dtype'] = 'bfloat16'
    det = PointPillarsDetector(model_cfg=mc, head_cfg=hc)
    batch = synthetic_batch(batch_size=bsz, num_points=npts, num_gt=16,
                            pc_range=pcr, num_feats=nfeat)
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)
    opt = ts.make_optimizer(1e-3, total_steps=1000)
    state = ts.init_state(variables['params'], variables['batch_stats'], opt)

    def apply_fn(vs, b, train):
        return det.apply_train(vs, b)

    step = jax.jit(ts.make_train_step(apply_fn, det.loss, opt),
                   donate_argnums=(0,))

    # -- experiment 1: numpy batch (per-call H2D) vs device-resident -----
    t_np, state = chain_time_state(step, state, batch, n_lo=2, n_hi=8)
    print(f'step (numpy batch, per-call H2D): {t_np*1e3:.3f} ms', flush=True)
    dbatch = jax.device_put(batch)
    t_dev, state = chain_time_state(step, state, dbatch, n_lo=2, n_hi=8)
    print(f'step (device-resident batch):     {t_dev*1e3:.3f} ms',
          flush=True)

    # -- experiment 2: trace N steps ------------------------------------
    trace_dir = os.environ.get('PROFILE_DIR', '/tmp/jax-trace-step')
    nsteps = int(os.environ.get('PROFILE_STEPS', '8'))
    jax.profiler.start_trace(trace_dir)
    m = None
    for _ in range(nsteps):
        state, m = step(state, dbatch)
    float(m['loss'])   # readback fence
    jax.profiler.stop_trace()
    print(f'trace ({nsteps} steps) -> {trace_dir}', flush=True)

    import glob
    import subprocess
    pbs = sorted(glob.glob(trace_dir + '/plugins/profile/*/*.xplane.pb'))
    if pbs:
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     'profile_top_ops.py'),
                        pbs[-1], '--steps', str(nsteps), '--top', '30'])


if __name__ == '__main__':
    main()
