"""Persistent XLA compilation cache setup.

Full-model TPU compiles take minutes through the axon tunnel; enabling the
jax persistent cache makes every re-run (bench, train restart, driver
compile checks) start hot.  Call :func:`enable` before the first jit.
"""
import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), '.jax_cache')


def enable(cache_dir: str = None):
    path = cache_dir or os.environ.get('M3DG_JAX_CACHE', DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    return path
