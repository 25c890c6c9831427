#!/usr/bin/env python
"""Microbench the row-serialized ops that dominate voxelization phases.

The round-2 trace (PARITY.md "Throughput") showed XLA executing segment /
gather / scatter machinery at ~8.6 ns/row regardless of row width.  This
script times each primitive in isolation at a configurable scale with the
honest chained-readback clock so the hard_voxelize / dynamic-PFN rewrites
can be designed against measured numbers instead of trace guesses.

Usage:  python tools/misc/bench_row_ops.py [N] [C] [V]
        N = points (default 360000, Waymo b2), C = channels (64),
        V = voxels (64000).
"""
import sys
import os.path as osp
sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

from mmdet3d_gaussian_tpu.utils import xla_tuning
xla_tuning.enable()

import jax
import jax.numpy as jnp
import numpy as np

from mmdet3d_gaussian_tpu.engine.timing import chain_time, make_probe


def t(fn, *args, n_lo=2, n_hi=8):
    return chain_time(make_probe(fn, *args), n_lo=n_lo, n_hi=n_hi) * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 360000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    v = int(sys.argv[3]) if len(sys.argv) > 3 else 64000

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(n, c).astype(np.float32))
    data5 = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    keys = jnp.asarray(rng.randint(0, v, size=n).astype(np.int32))
    seg_sorted = jnp.sort(keys)
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    vox_rows = jnp.asarray(rng.randn(v + 1, c).astype(np.float32))

    rows = []

    def rec(name, ms):
        rows.append((name, ms, ms * 1e6 / n))
        print(f'{name:44s} {ms:8.3f} ms   {ms*1e6/n:7.2f} ns/row',
              flush=True)

    # sort machinery
    rec('argsort int32 keys', t(lambda k: jnp.argsort(k), keys))
    rec('sort_kv (key + 1 int payload)',
        t(lambda k: jax.lax.sort((k, jnp.arange(n, dtype=jnp.int32)),
                                 num_keys=1), keys))

    # gathers
    rec(f'row gather ({c}ch, unsorted ids)',
        t(lambda d, i: jnp.take(d, i, axis=0), vox_rows, keys))
    rec(f'row gather ({c}ch, sorted ids+flag)',
        t(lambda d, i: jnp.take(d, i, axis=0, indices_are_sorted=True),
          vox_rows, seg_sorted))
    rec('row gather permutation (NxC by order)',
        t(lambda d, i: jnp.take(d, i, axis=0), data, order))
    rec('row gather permutation (Nx8 by order)',
        t(lambda d, i: jnp.take(d, i, axis=0), data5, order))

    # scatters
    rec('scatter rows .at[order].set (NxC perm)',
        t(lambda d, i: jnp.zeros_like(d).at[i].set(d), data, order))
    rec('scatter rows .at[order].set (Nx8 perm)',
        t(lambda d, i: jnp.zeros_like(d).at[i].set(d), data5, order))
    rec('scatter 1col .at[order].set (N int32)',
        t(lambda i: jnp.zeros((n,), jnp.int32).at[i].set(
            jnp.arange(n, dtype=jnp.int32)), order))

    # segment reductions
    rec('segment_sum NxC -> V+1 (sorted flag)',
        t(lambda d, s: jax.ops.segment_sum(d, s, num_segments=v + 1,
                                           indices_are_sorted=True),
          data, seg_sorted))
    rec('segment_sum NxC -> V+1 (unsorted)',
        t(lambda d, s: jax.ops.segment_sum(d, s, num_segments=v + 1),
          data, keys))
    rec('segment_max NxC -> V+1 (sorted flag)',
        t(lambda d, s: jax.ops.segment_max(d, s, num_segments=v + 1,
                                           indices_are_sorted=True),
          data, seg_sorted))

    # one-hot matmul alternative for narrow payloads: (V+1, N) x (N, 8)
    # is enormous; instead measure a tiled cumsum-style approach baseline:
    rec('cumsum N (f32 x C)', t(lambda d: jnp.cumsum(d, axis=0), data))

    # hard-voxelize style 2D scatter: (N,) rows into (V+1, P, 8)
    p = 20
    vv = jnp.minimum(keys, v)
    pp = jnp.asarray(rng.randint(0, p, size=n).astype(np.int32))
    rec('2D scatter .at[v,p].set (N rows x 8ch)',
        t(lambda d, a, b: jnp.zeros((v + 1, p, 8), d.dtype)
          .at[a, b].set(d)[:v], data5, vv, pp))
    lin = vv * p + pp
    rec('1D-linearized scatter .at[lin].set (x8ch)',
        t(lambda d, i: jnp.zeros((( v + 1) * p, 8), d.dtype)
          .at[i].set(d)[:v * p], data5, lin))
    lin_sorted = jnp.sort(lin)
    rec('1D-lin scatter sorted+unique flags (x8ch)',
        t(lambda d, i: jnp.zeros(((v + 1) * p, 8), d.dtype)
          .at[i].set(d, indices_are_sorted=True, unique_indices=True)
          [:v * p], data5, lin_sorted))

    print('\nsummary (ns/row):')
    for name, ms, nsrow in rows:
        print(f'  {name:44s} {nsrow:7.2f}')




def column_tricks():
    """Column-wise forms of the expensive ops: a 1-col (N,) scatter measured
    ~350x cheaper per element than an (N, 8) row scatter."""
    n, c, v, p = 360000, 64, 64000, 20
    rng = np.random.RandomState(0)
    data8 = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    data64 = jnp.asarray(rng.randn(n, c).astype(np.float32))
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    keys = jnp.asarray(rng.randint(0, v, size=n).astype(np.int32))
    seg_sorted = jnp.sort(keys)
    # sorted-unique destinations into a (V*P+1) table (hard-voxelize form)
    dest = jnp.sort(jnp.asarray(
        rng.choice(v * p, size=n, replace=False).astype(np.int32)))

    def rec(name, ms):
        print(f'{name:46s} {ms:8.3f} ms   {ms*1e6/n:7.2f} ns/row',
              flush=True)

    rec('f32 1-col scatter N->N .at[order].set',
        t(lambda d, i: jnp.zeros((n,), d.dtype).at[i].set(d),
          data8[:, 0], order))
    rec('f32 1-col scatter N->V*P+1 sorted unique',
        t(lambda d, i: jnp.zeros((v * p + 1,), d.dtype)
          .at[i].set(d, indices_are_sorted=True, unique_indices=True),
          data8[:, 0], dest))

    def col_scatter8(d, i):
        cols = [jnp.zeros((v * p + 1,), d.dtype)
                .at[i].set(d[:, j], indices_are_sorted=True,
                           unique_indices=True) for j in range(8)]
        return jnp.stack(cols, -1)
    rec('8x 1-col scatter N->V*P+1 (stacked)', t(col_scatter8, data8, dest))

    def col_gather8(d, i):
        return jnp.stack([jnp.take(d[:, j], i, axis=0) for j in range(8)],
                         -1)
    rec('8x 1-col gather perm (vs 1.6 ms row form)',
        t(col_gather8, data8, order))

    def col_segsum8(d, s):
        return jnp.stack([jax.ops.segment_sum(
            d[:, j], s, num_segments=v + 1, indices_are_sorted=True)
            for j in range(8)], -1)
    rec('8x 1-col segment_sum -> V+1', t(col_segsum8, data8, seg_sorted))

    def col_segsum64(d, s):
        return jnp.stack([jax.ops.segment_sum(
            d[:, j], s, num_segments=v + 1, indices_are_sorted=True)
            for j in range(c)], -1)
    rec('64x 1-col segment_sum -> V+1 (vs 3.7 row)',
        t(col_segsum64, data64, seg_sorted))

    def col_gather_table(dtab, i):
        return jnp.stack([jnp.take(dtab[:, j], i, axis=0)
                          for j in range(8)], -1)
    tab8 = jnp.asarray(rng.randn(v + 1, 8).astype(np.float32))
    rec('8x 1-col table gather (mapback form)',
        t(col_gather_table, tab8, keys))


if __name__ == '__main__':
    import os
    if os.environ.get('ROWOPS_COLUMNS') == '1':
        column_tricks()
    else:
        main()
