"""Honest-clock instrument (engine/timing.py) sanity on CPU.

On CPU the chained-readback slope is simply exact, so it must agree with a
plain block_until_ready wall clock on a known workload, and the chain must
actually serialize the work (slope scales with workload size).
"""
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdet3d_gaussian_tpu.engine.timing import (chain_time, chain_time_state,
                                                make_probe)


def _work(n):
    a = jnp.ones((n, n), jnp.float32)

    def f(x):
        return (x @ x).sum()
    return jax.jit(f), a


def test_chain_time_matches_wall_clock():
    fn, a = _work(600)
    t_chain = chain_time(make_probe(fn, a), n_lo=2, n_hi=10)

    fn(a).block_until_ready()
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        fn(a).block_until_ready()
    t_wall = (time.perf_counter() - t0) / reps
    # CPU matmul timing is noisy; agree within 3x both ways
    assert t_chain < 3 * t_wall and t_wall < 3 * t_chain, (t_chain, t_wall)


def test_chain_time_scales_with_work():
    f_small, a_small = _work(128)
    f_big, a_big = _work(1024)
    t_small = chain_time(make_probe(f_small, a_small), n_lo=2, n_hi=10)
    t_big = chain_time(make_probe(f_big, a_big), n_lo=2, n_hi=10)
    # 8x size -> 512x FLOPs; demand at least 10x measured
    assert t_big > 10 * t_small, (t_small, t_big)


def test_chain_time_state_threads_state():
    def step(state, batch):
        new = state + jnp.sum(batch)
        return new, {'loss': new}

    stepj = jax.jit(step)
    t, final = chain_time_state(stepj, jnp.zeros(()), jnp.ones((8,)),
                                n_lo=2, n_hi=6, reps=1)
    assert t >= 0.0
    # 1 warm + (2 + 6) per rep = 9 steps of +8
    assert float(final) == pytest.approx(8.0 * 9)


def test_make_probe_fences_integer_outputs():
    """A fn returning ONLY integer leaves must not dead-code away: the
    probe scalar must depend on the int outputs (regression: the bench's
    dynamic-voxelize phase probe returned int32 voxel coords only and
    compiled to a constant, reporting ~0 ms)."""
    def int_only(x):
        return (x * 2.0).astype(jnp.int32)

    probe = make_probe(int_only, jnp.arange(8, dtype=jnp.float32))
    base = float(probe(jnp.zeros((), jnp.float32)))
    probe2 = make_probe(int_only, jnp.arange(8, dtype=jnp.float32) + 100.0)
    shifted = float(probe2(jnp.zeros((), jnp.float32)))
    assert base != 0.0
    assert shifted != base
