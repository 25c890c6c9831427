"""Test harness config: force an 8-device virtual CPU platform.

This is the TPU answer to "multi-node testing without a cluster"
(SURVEY.md §4): every sharding/pjit test sees 8 devices while the math tests
run the same code single-device.

NOTE: the axon TPU plugin in this image ignores ``JAX_PLATFORMS=cpu`` set via
environment, so we use ``jax.config`` directly — this must run before any
backend is initialized (conftest import time is early enough for pytest).
"""
import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
