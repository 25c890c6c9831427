"""LR / momentum schedules (optax-style scalar schedules).

Re-provision of the reference's training schedule stack:

* cyclic one-cycle LR & momentum (mmcv ``CyclicLrUpdater`` semantics used by
  ``configs/_base_/schedules/cyclic_40e.py:16-27``): cosine-annealed ramp
  base->base*up_ratio over ``step_ratio_up`` of the cycle, then
  base*up_ratio -> base*down_ratio over the rest.
* :func:`detailed_linear_warmup` — the reference's per-param-kind warmup hook
  (``core/custom_hooks/warmup_hooks.py:4-60``): over ``warmup_iters``, bias
  LR starts at 10x base, weight LR at 0x base, both linearly approaching the
  base schedule; momentum scaled by 0.95 -> 1.  Returned as *multiplier*
  schedules to compose with any base schedule via masked optax transforms.
* step decay (``schedule_2x.py`` style) for completeness.
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp


def _cosine_anneal(start: float, end: float, frac):
    return end + 0.5 * (start - end) * (1 + jnp.cos(math.pi * frac))


def cyclic_schedule(base: float, total_steps: int,
                    target_ratio=(10.0, 1e-4), cyclic_times: int = 1,
                    step_ratio_up: float = 0.4) -> Callable:
    """mmcv cyclic policy: cosine up to base*r_up then cosine down to
    base*r_down, repeated ``cyclic_times`` over ``total_steps``."""
    r_up, r_down = target_ratio
    period = max(1, total_steps // cyclic_times)
    up_steps = int(period * step_ratio_up)

    def schedule(step):
        s = jnp.asarray(step) % period
        in_up = s < up_steps
        frac_up = s / jnp.maximum(up_steps, 1)
        frac_down = (s - up_steps) / jnp.maximum(period - up_steps, 1)
        up = _cosine_anneal(base, base * r_up, frac_up)
        down = _cosine_anneal(base * r_up, base * r_down, frac_down)
        return jnp.where(in_up, up, down)

    return schedule


def step_schedule(base: float, milestones: Sequence[int],
                  gamma: float = 0.1) -> Callable:
    def schedule(step):
        lr = jnp.asarray(base)
        for m in milestones:
            lr = jnp.where(step >= m, lr * gamma, lr)
        return lr

    return schedule


def detailed_linear_warmup(warmup_iters: int = 10000,
                           lr_weight_warmup_ratio: float = 0.0,
                           lr_bias_warmup_ratio: float = 10.0,
                           momentum_warmup_ratio: float = 0.95):
    """Returns (weight_mult, bias_mult, momentum_mult) schedules.

    multiplier(step) = prog + (1 - prog) * ratio for step <= warmup_iters,
    1 afterwards (reference ``warmup_hooks.py:42-60``).
    """

    def _mult(ratio):
        def schedule(step):
            prog = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
            return prog + (1 - prog) * ratio

        return schedule

    return (_mult(lr_weight_warmup_ratio), _mult(lr_bias_warmup_ratio),
            _mult(momentum_warmup_ratio))
