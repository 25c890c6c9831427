"""Lane-blocked prefix scans for 1-D int32 arrays on TPU.

XLA lowers ``jnp.cumsum`` / ``lax.cummax`` over long 1-D int arrays to a
serialized scan (~7 ns/element on v5e) — the build_scatter id machinery
spent ~1.5 ms/step on three such scans at KITTI b4 (65k points).  The
blocked form reshapes to (rows, 128) lanes, runs a Hillis–Steele scan
inside the row (7 shifted element-wise passes, pure VPU work), then
recursively scans the per-row totals and broadcasts the exclusive prefix
back — O(N log 128 / 128) vector ops instead of O(N) serial steps.

Parity: ``tests/test_scan.py`` checks both ops against numpy on ragged
lengths; semantics are exactly ``jnp.cumsum`` / ``jax.lax.cummax``
(inclusive scans).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['cumsum_i32', 'cummax_i32']

_LANES = 128
# below this length the serialized XLA scan is already microseconds
_SMALL = 2048


def _blocked_scan(x, op, identity):
    n = x.shape[0]
    if n <= _SMALL:
        return jax.lax.associative_scan(op, x)
    rows = -(-n // _LANES)
    pad = rows * _LANES - n
    y = jnp.pad(x, (0, pad), constant_values=identity).reshape(rows, _LANES)
    # in-row inclusive scan: log2(128) shifted passes along lanes
    k = 1
    while k < _LANES:
        shifted = jnp.pad(y, ((0, 0), (k, 0)),
                          constant_values=identity)[:, :_LANES]
        y = op(y, shifted)
        k *= 2
    row_tot = y[:, -1]
    # exclusive prefix of the row totals (recursive; rows <= n/128)
    inc = _blocked_scan(row_tot, op, identity)
    exc = jnp.concatenate([jnp.full((1,), identity, x.dtype), inc[:-1]])
    return op(y, exc[:, None]).reshape(-1)[:n]


def cumsum_i32(x) -> jax.Array:
    """Inclusive cumsum of a 1-D int32 array (== ``jnp.cumsum``)."""
    return _blocked_scan(x.astype(jnp.int32), jnp.add, 0)


def cummax_i32(x) -> jax.Array:
    """Inclusive cummax of a 1-D int32 array (== ``jax.lax.cummax``)."""
    return _blocked_scan(x.astype(jnp.int32), jnp.maximum,
                         jnp.iinfo(jnp.int32).min)
