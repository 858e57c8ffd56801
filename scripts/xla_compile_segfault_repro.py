"""Minimal repro hunt for the suite's single-process XLA-CPU segfault.

Observed three times (twice round-2, once 2026-08-17 with the small-program
suite knobs): a SINGLE pytest process running the whole suite segfaults near
the end, while every test passes in isolation and xdist workers (-n 4) never
crash. The hazard tracks per-process compile COUNT, not program size.

This script isolates the suspected mechanism: compile-and-run N DISTINCT
pallas-interpret programs (a trivial kernel whose body embeds a varying
constant, so nothing is cache-shared) in one process, printing progress so a
crash point is visible. Run:

    python scripts/xla_compile_segfault_repro.py [N=300]

Outcome so far: see the line this prints last — if it reaches N cleanly, raw
pallas-compile count alone does NOT reproduce, and the suite crash needs the
real test mix (virtual 8-device mesh + shard_map + large interpret programs).
Either way the result turns the 'mitigated bomb' into a characterized one.
"""

import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
from jax.experimental import pallas as pl


def make(i):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * jnp.float32(1.0 + i) + jnp.float32(i)

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    x = jnp.ones((8, 128), jnp.float32)
    for i in range(n):
        y = jax.jit(make(i))(x)
        y.block_until_ready()
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{n} distinct pallas-interpret compiles OK",
                  flush=True)
    print(f"clean exit after {n} compiles — count alone does not reproduce")
    return 0


if __name__ == "__main__":
    sys.exit(main())
