"""Test harness config: force an 8-device virtual CPU mesh.

This machine's interpreter boots with a sitecustomize hook that force-registers the
experimental "axon" TPU backend (ignoring JAX_PLATFORMS), so we override the platform
via jax.config *before any backend is instantiated*. Real-TPU benchmarking happens
only via bench.py, never in tests.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
