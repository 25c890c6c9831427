"""E2E hardware validation for the Pallas BEV splat kernel.

Runs the flagship train step (KITTI PointPillars, dynamic voxelize,
b4 x 16384 — BASELINE.json's north-star config) twice on the attached
chip: once with the XLA segment-sum splat (``SPLAT_IMPL='xla'``) and once
with the Pallas window-DMA kernel (``SPLAT_IMPL='pallas'``), then reports

  * loss values under both implementations (same params, same batch),
  * max relative per-parameter gradient deviation,
  * honest step time for both (chained-readback slope — engine/timing.py).

The Pallas canvas is bf16-rounded by design (see
``ops/pallas/bev_splat_kernel.py`` module docstring), so exact equality is
not expected; the pass criterion is loss within 1% relative and grads
within bf16-rounding tolerance.  This is the gate for flipping
``ops.voxelize.SPLAT_IMPL`` from 'xla' to 'auto'.

Usage: python tools/misc/validate_pallas_splat.py  (on a TPU host)
"""
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mmdet3d_gaussian_tpu.utils import cache as _cc
    _cc.enable()
    from mmdet3d_gaussian_tpu.engine.detector import (PointPillarsDetector,
                                                      synthetic_batch)
    from mmdet3d_gaussian_tpu.engine.timing import chain_time_state
    from mmdet3d_gaussian_tpu.ops import voxelize as vx
    from mmdet3d_gaussian_tpu.parallel import train_state as ts

    det = PointPillarsDetector(model_cfg=dict(voxelize_mode='dynamic'))
    batch = synthetic_batch(batch_size=4, num_points=16384, num_gt=16,
                            pc_range=(0., -39.68, -3., 69.12, 39.68, 1.))
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)
    opt = ts.make_optimizer(1e-3, total_steps=1000)

    def loss_and_grads():
        # fresh traces each call: SPLAT_IMPL is read at trace time
        def lf(params):
            out, _ = det.apply_train(
                {'params': params,
                 'batch_stats': variables['batch_stats']}, batch)
            loss, _ = det.loss(out, batch)
            return loss
        val, grads = jax.jit(jax.value_and_grad(lf))(variables['params'])
        return np.asarray(jax.device_get(val)), jax.device_get(grads)

    def step_time():
        state = ts.init_state(variables['params'], variables['batch_stats'],
                              opt)

        def apply_fn(vs, b, train):
            return det.apply_train(vs, b)

        step = jax.jit(ts.make_train_step(apply_fn, det.loss, opt))
        dt, _ = chain_time_state(step, state, batch)
        return dt

    # 0) op-level canvas check at KITTI b4 scale: sorted-unique rows
    rng = np.random.RandomState(0)
    ncell = 4 * 496 * 432
    v, c = 65536, 64
    lin_np = np.sort(rng.choice(ncell, size=v - 512, replace=False))
    lin_np = np.concatenate([lin_np, np.full((512,), ncell)])  # invalid tail
    feats_np = rng.randn(v, c).astype(np.float32)
    feats_j = jnp.asarray(feats_np)
    lin_j = jnp.asarray(lin_np.astype(np.int32))

    @jax.jit
    def canvas_xla(f, l):
        z = jnp.where((l < ncell)[:, None], f, 0)
        cv = jax.ops.segment_sum(z, l, num_segments=ncell + 1,
                                 indices_are_sorted=True)
        return cv[:-1]

    from mmdet3d_gaussian_tpu.ops.pallas.bev_splat_kernel import (
        bev_splat_pallas)
    cx = np.asarray(jax.device_get(canvas_xla(feats_j, lin_j)))
    cp = np.asarray(jax.device_get(
        jax.jit(lambda f, l: bev_splat_pallas(f, l, ncell))(feats_j, lin_j)),
        np.float64)
    canvas_rel = float(np.abs(cx - cp).max() / np.abs(cx).max())
    print(json.dumps({'canvas_max_rel': round(canvas_rel, 6),
                      'canvas_dtype': str(cp.dtype)}), flush=True)

    results = {}
    for impl in ('xla', 'pallas'):
        vx.SPLAT_IMPL = impl
        val, grads = loss_and_grads()
        dt = step_time()
        results[impl] = dict(loss=float(val), grads=grads,
                             step_ms=dt * 1e3)
        print(json.dumps({'impl': impl, 'loss': float(val),
                          'step_ms': round(dt * 1e3, 3)}), flush=True)

    gx = jax.tree_util.tree_leaves_with_path(results['xla']['grads'])
    gp = jax.tree_util.tree_leaves(results['pallas']['grads'])
    rows = []
    for (path, a), b in zip(gx, gp):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = max(float(np.abs(a).max()), 1e-6)
        rows.append((float(np.abs(a - b).max() / denom),
                     jax.tree_util.keystr(path),
                     float(np.abs(a).max()),
                     float(np.linalg.norm(a - b) / max(np.linalg.norm(a),
                                                       1e-12))))
    rows.sort(reverse=True)
    for r in rows[:6]:
        print(json.dumps({'leaf': r[1], 'max_rel': round(r[0], 4),
                          'grad_scale': r[2],
                          'l2_rel': round(r[3], 4)}), flush=True)
    rel = rows[0][0]
    loss_rel = abs(results['pallas']['loss'] - results['xla']['loss']) / max(
        abs(results['xla']['loss']), 1e-6)
    verdict = dict(
        loss_rel=round(loss_rel, 6),
        grad_max_rel=round(rel, 6),
        xla_step_ms=round(results['xla']['step_ms'], 3),
        pallas_step_ms=round(results['pallas']['step_ms'], 3),
        passed=bool(loss_rel < 0.01 and rel < 0.05
                    and np.isfinite(results['pallas']['loss'])),
    )
    print(json.dumps(verdict), flush=True)
    return verdict


if __name__ == '__main__':
    main()
