"""Profiling / tracing utilities.

The reference has no profiler (SURVEY.md §5) — only iteration timing via
logger hooks.  Here: ``jax.profiler`` trace capture + a micro-bench
harness for per-stage speed-of-light numbers.

Timing note: ``block_until_ready`` does NOT fence execution through the
axon TPU tunnel (it returns at dispatch) — :func:`timeit` therefore
delegates to the chained-readback slope instrument in
:mod:`~mmdet3d_gaussian_tpu.engine.timing`; on directly-attached devices
(and CPU) the same instrument is simply exact.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/jax-trace'):
    """Capture an XLA/TPU profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, iters: int = 8, warmup: int = 2,
           name: str = '') -> float:
    """Honest seconds/iter of ``fn(*args)`` (chained-readback slope)."""
    del warmup
    from .timing import chain_time, make_probe
    dt = chain_time(make_probe(fn, *args), n_lo=2, n_hi=max(4, iters))
    if name:
        print(f'{name}: {dt * 1e3:.3f} ms/iter')
    return dt


def stage_breakdown(det, batch, variables) -> Dict[str, float]:
    """Per-stage timings of the PointPillars pipeline (fwd only)."""
    import jax.numpy as jnp
    from ..ops.scatter import batch_coords, compute_voxel_coords
    from ..ops.voxelize import hard_voxelize

    out = {}
    trunk = det.trunk
    b, n, cdim = batch['points'].shape
    nx, ny = trunk._grid()
    nz = max(1, int(round((trunk.point_cloud_range[5]
                           - trunk.point_cloud_range[2])
                          / trunk.voxel_size[2])))

    @jax.jit
    def voxelize_only(points, mask):
        flat = points.reshape(b * n, cdim)
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
        coords3, _ = compute_voxel_coords(flat[:, :3],
                                          trunk.point_cloud_range,
                                          trunk.voxel_size)
        coords3 = jnp.where(mask.reshape(-1, 1), coords3, -1)
        coords4 = batch_coords(coords3, bidx)
        hv = hard_voxelize(flat, coords4, (b, nx, ny, nz),
                           trunk.max_points_per_voxel,
                           trunk.max_voxels_per_sample * b)
        return hv.voxels

    out['voxelize'] = timeit(voxelize_only, batch['points'],
                             batch['points_mask'], name='voxelize')
    fwd = jax.jit(lambda v, bt: det.apply_eval(v, bt))
    out['forward'] = timeit(fwd, variables, batch, name='forward (trunk)')
    lossf = jax.jit(lambda v, bt: det.loss(det.apply_eval(v, bt), bt))
    out['fwd+loss'] = timeit(lossf, variables, batch, name='fwd+loss')
    return out
