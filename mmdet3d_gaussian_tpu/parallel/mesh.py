"""Device mesh + sharding helpers.

The reference's entire distributed runtime is DDP over NCCL
(``tools/dist_train.sh``, ``init_dist`` at ``tools/train.py:134``).  The
TPU-native equivalent is declarative: build a ``jax.sharding.Mesh``, annotate
batch-sharded inputs with ``P('data', ...)``, keep params replicated, and let
XLA emit ICI collectives (psum for grad all-reduce, overlapped with backward
by the latency-hiding scheduler).  Multi-host bring-up is
``jax.distributed.initialize`` + the same code (SURVEY.md §2.11).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ('data',),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = 'data'):
    """Device-put every array in a pytree with its leading axis sharded."""
    sh = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def use_mesh(mesh: Mesh):
    """Context manager installing ``mesh`` as the ambient mesh.

    jax renamed ``use_mesh`` -> ``set_mesh`` in 0.9; this wraps whichever
    exists so callers stay version-agnostic."""
    import jax.sharding as jsh
    fn = getattr(jsh, 'use_mesh', None) or getattr(jsh, 'set_mesh')
    return fn(mesh)
