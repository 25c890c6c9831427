"""Cyclic LR/momentum schedules + warmup multipliers vs reference semantics."""
import numpy as np
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.core.schedules import (cyclic_schedule,
                                                 detailed_linear_warmup,
                                                 step_schedule)


def test_cyclic_one_cycle_shape():
    base = 0.0018
    sched = cyclic_schedule(base, 1000, target_ratio=(10, 1e-4),
                            step_ratio_up=0.4)
    # start at base, peak base*10 at 40%, end near base*1e-4
    np.testing.assert_allclose(float(sched(0)), base, rtol=1e-6)
    np.testing.assert_allclose(float(sched(400)), base * 10, rtol=1e-3)
    assert float(sched(999)) < base * 1e-2
    # monotone up then down
    ups = [float(sched(s)) for s in range(0, 400, 50)]
    downs = [float(sched(s)) for s in range(400, 1000, 50)]
    assert all(a <= b + 1e-9 for a, b in zip(ups, ups[1:]))
    assert all(a >= b - 1e-9 for a, b in zip(downs, downs[1:]))


def test_step_schedule():
    sched = step_schedule(1.0, [10, 20], gamma=0.1)
    assert float(sched(5)) == 1.0
    np.testing.assert_allclose(float(sched(15)), 0.1)
    np.testing.assert_allclose(float(sched(25)), 0.01, rtol=1e-6)


def test_detailed_linear_warmup():
    w, b, m = detailed_linear_warmup(warmup_iters=100,
                                     lr_weight_warmup_ratio=0.0,
                                     lr_bias_warmup_ratio=10.0,
                                     momentum_warmup_ratio=0.95)
    # reference warmup_hooks.py:42-60: mult = prog + (1-prog)*ratio
    np.testing.assert_allclose(float(w(0)), 0.0)
    np.testing.assert_allclose(float(b(0)), 10.0)
    np.testing.assert_allclose(float(m(0)), 0.95)
    np.testing.assert_allclose(float(w(50)), 0.5)
    np.testing.assert_allclose(float(b(50)), 5.5)
    for f in (w, b, m):
        np.testing.assert_allclose(float(f(100)), 1.0)
        np.testing.assert_allclose(float(f(500)), 1.0)
