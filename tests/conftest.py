"""Test harness config: force an 8-device virtual CPU mesh.

This machine's interpreter boots with a sitecustomize hook that force-registers the
experimental "axon" TPU backend (ignoring JAX_PLATFORMS), so we override the platform
via jax.config *before any backend is instantiated*. Real-TPU benchmarking happens
only via bench.py, never in tests.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Run the suite with the CHEAP perf-knob settings. The shipped knobs
# (REMASK_SCHEDULE, PHASEB_UNROLL, PHASEA_UNROLL) only unroll loop bodies —
# every one is a value-identical program transformation, verified bit-exact
# in interpret mode AND pinned by tests/test_perf_knobs.py, which renders
# once with the shipped values against this cheap baseline. The unrolled
# programs are 2-16x larger, and XLA-CPU compile time (the bulk of a small
# interpret-mode render: 193 s -> 43 s measured on one test-sized frame) is
# superlinear in program size — so the suite runs the small programs and
# covers the big ones via the dedicated bit-identity tests.
from bevyray_tpu.kernels.pallas import megakernel as _mk

CHEAP_KNOBS = {"REMASK_SCHEDULE": (), "PHASEB_UNROLL": 1,
               "PHASEA_UNROLL": False, "PHASE_FUSE": 1,
               "FLAT_WALK_STEPS": 1}
SHIPPED_KNOBS = {k: getattr(_mk, k) for k in CHEAP_KNOBS}
for _k, _v in CHEAP_KNOBS.items():
    setattr(_mk, _k, _v)
