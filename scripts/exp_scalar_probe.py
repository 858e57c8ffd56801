"""TPU microbench: what does the sphere loop's SCALAR side actually cost?

The round-1/2 walls say the brute walk is scalar/vector co-bottlenecked
(~23 vector ops + 4 SMEM scalar loads per sphere). This probe times the same
per-sphere arithmetic under different sphere-data delivery mechanisms, on a
synthetic fixed-trip-count loop (no path logic, so trip counts are identical
across variants and timing differences isolate the delivery cost):

  smem       — per-sphere scalars streamed from SMEM (the production design)
  halfscalar — SMEM reads for every OTHER sphere (same vector work, half the
               scalar loads — slope of the scalar cost)
  const      — sphere data as compile-time constants (zero scalar loads; upper
               bound on any scalar-removal win)
  vecquad    — 4 spheres per vector op: data as (32,1) VMEM loads broadcast
               over lanes, rays on (8,128) sublane-blocks, quad min-reduce
               epilogue (the candidate phase-B layout)

Prints one JSON line per variant: ns per sphere·ray pair-test.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 512          # spheres
GROUP = 32
REPS = 64        # sphere-table sweeps per kernel
TILES = 64       # grid size (amortize launch)


def ray_tile(seed_ref, nsub):
    sub = jax.lax.broadcasted_iota(jnp.int32, (nsub, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nsub, 128), 1)
    t = pl.program_id(0)
    base = (sub * 131 + lane * 7 + t * 977 + seed_ref[0, 0]).astype(jnp.float32)
    ox = base * 1.9073486e-06
    oy = ox * 0.618 + 0.1
    oz = ox * 0.382 - 0.2
    dx = 0.57 + ox * 1e-3
    dy = -0.57 + oy * 1e-3
    dz = 0.59 + oz * 1e-3
    return (ox, oy, oz), (dx, dy, dz)


def test_core(o, d, cx, cy, cz, r2, a, q_min, best_q):
    ox, oy, oz = o
    dx, dy, dz = d
    ocx = cx - ox
    ocy = cy - oy
    ocz = cz - oz
    h = dx * ocx + dy * ocy + dz * ocz
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
    disc = h * h - a * cc
    q = h - jnp.sqrt(disc)
    better = (q > q_min) & (q < best_q)
    return jnp.where(better, q, best_q)


def kern_scalar(seed_ref, sph_ref, out_ref, *, stride):
    o, d = ray_tile(seed_ref, 32)
    dx, dy, dz = d
    a = dx * dx + dy * dy + dz * dz
    q_min = a * 1e-3

    def rep(i, best_q):
        def grp(g, bq):
            for j in range(GROUP):
                s = g * GROUP + (j // stride) * stride
                bq = test_core(o, d, sph_ref[0, s], sph_ref[1, s],
                               sph_ref[2, s], sph_ref[3, s], a, q_min, bq)
            return bq
        return jax.lax.fori_loop(0, S // GROUP, grp, best_q)

    out_ref[0] = jax.lax.fori_loop(
        0, REPS, rep, jnp.full((32, 128), 1e30, jnp.float32))


def kern_fma(seed_ref, sph_ref, out_ref, *, sqrt_free=False):
    # Expanded-form test: h = d·c - d·o and |oc|² = |o|² - 2o·c + |c|², with
    # -2c and k = |c|² - r² precomputed host-side (rows 4-6 and 7 unused here;
    # table layout (7, S): cx cy cz m2x m2y m2z k). ~16 ops if Mosaic forms
    # the fma chains. sqrt_free swaps sqrt for a mul (diagnostic: sqrt's cost).
    o, d = ray_tile(seed_ref, 32)
    ox, oy, oz = o
    dx, dy, dz = d
    a = dx * dx + dy * dy + dz * dz
    q_min = a * 1e-3
    ndo = -(dx * ox + dy * oy + dz * oz)
    oo = ox * ox + oy * oy + oz * oz

    def rep(i, best_q):
        def grp(g, bq):
            for j in range(GROUP):
                s = g * GROUP + j
                h = dx * sph_ref[0, s] + (dy * sph_ref[1, s]
                                          + (dz * sph_ref[2, s] + ndo))
                ook = oo + sph_ref[6, s]
                cc = ox * sph_ref[3, s] + (oy * sph_ref[4, s]
                                           + (oz * sph_ref[5, s] + ook))
                disc = h * h - a * cc
                if sqrt_free:
                    q = h - disc * 0.25
                else:
                    q = h - jnp.sqrt(disc)
                better = (q > q_min) & (q < bq)
                bq = jnp.where(better, q, bq)
            return bq
        return jax.lax.fori_loop(0, S // GROUP, grp, best_q)

    out_ref[0] = jax.lax.fori_loop(
        0, REPS, rep, jnp.full((32, 128), 1e30, jnp.float32))


def kern_const(seed_ref, sph_ref, out_ref):
    o, d = ray_tile(seed_ref, 32)
    dx, dy, dz = d
    a = dx * dx + dy * dy + dz * dz
    q_min = a * 1e-3
    rng = np.random.RandomState(0)
    consts = rng.uniform(-8, 8, (GROUP, 4)).astype(np.float32)

    def rep(i, best_q):
        def grp(g, bq):
            for j in range(GROUP):
                cx, cy, cz, r2 = (np.float32(v) for v in consts[j])
                bq = test_core(o, d, cx, cy, cz, r2 * r2, a, q_min, bq)
            return bq
        return jax.lax.fori_loop(0, S // GROUP, grp, best_q)

    out_ref[0] = jax.lax.fori_loop(
        0, REPS, rep, jnp.full((32, 128), 1e30, jnp.float32))


def kern_vecquad(seed_ref, tbl_ref, out_ref):
    # tbl_ref: (S//4 * 32, 4) f32 — quad q rows [32q:32q+32]: sublane-block j
    # (rows 8j..8j+7) holds sphere 4q+j's (cx, cy, cz, r²) replicated; lane
    # broadcast happens in-op from the (32, 1) column slices.
    o8, d8 = ray_tile(seed_ref, 8)
    o = tuple(jnp.concatenate([v, v, v, v], axis=0) for v in o8)
    d = tuple(jnp.concatenate([v, v, v, v], axis=0) for v in d8)
    dx, dy, dz = d
    a = dx * dx + dy * dy + dz * dz
    q_min = a * 1e-3

    def rep(i, best_q):
        def quad(qi, bq):
            blk = tbl_ref[pl.ds(qi * 32, 32), :]
            cx = blk[:, 0:1]
            cy = blk[:, 1:2]
            cz = blk[:, 2:3]
            r2 = blk[:, 3:4]
            qv = test_core(o, d, cx, cy, cz, r2, a, q_min,
                           jnp.full((32, 128), 1e30, jnp.float32))
            # quad reduce: min over the 4 sublane-blocks, then merge into best
            m = jnp.minimum(qv[:16], qv[16:])
            m = jnp.minimum(m[:8], m[8:])
            return jnp.minimum(bq, jnp.concatenate([m, m, m, m], axis=0))
        return jax.lax.fori_loop(0, S // 4, quad, best_q)

    out_ref[0] = jax.lax.fori_loop(
        0, REPS, rep, jnp.full((32, 128), 1e30, jnp.float32))


def run(name, kernel, table, table_space):
    f = pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(table.shape, lambda i: tuple(0 for _ in table.shape),
                         memory_space=table_space),
        ],
        out_specs=pl.BlockSpec((1, 32, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES, 32, 128), jnp.float32),
    )
    tbl = jnp.asarray(table)

    def call(seed):
        return f(jnp.array([[seed]], jnp.int32), tbl)

    np.asarray(call(0)[0, 0, 0])  # compile+warm
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(call(i + 1)[0, 0, 0])
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))
    rays = 32 * 128 * TILES
    pairs = rays * S * REPS
    print(json.dumps({"variant": name, "p50_ms": round(p50 * 1e3, 3),
                      "ns_per_pair": round(p50 / pairs * 1e9, 4)}), flush=True)


def main():
    rng = np.random.RandomState(1)
    sph = rng.uniform(-8, 8, (4, S)).astype(np.float32)
    sph[3] = sph[3] ** 2
    run("smem", functools.partial(kern_scalar, stride=1), sph, pltpu.SMEM)
    run("halfscalar", functools.partial(kern_scalar, stride=2), sph,
        pltpu.SMEM)
    run("const", kern_const, sph, pltpu.SMEM)
    quads = np.repeat(sph.T.reshape(S // 4, 4, 4), 8, axis=1)  # (S/4, 32, 4)
    run("vecquad", kern_vecquad, quads.reshape(S // 4 * 32, 4), pltpu.VMEM)
    k = sph[0] ** 2 + sph[1] ** 2 + sph[2] ** 2 - sph[3]
    sph7 = np.concatenate([sph[:3], -2.0 * sph[:3], k[None]], axis=0)
    sph7 = sph7.astype(np.float32)
    run("fma16", functools.partial(kern_fma, sqrt_free=False), sph7,
        pltpu.SMEM)
    run("sqrtfree", functools.partial(kern_fma, sqrt_free=True), sph7,
        pltpu.SMEM)


if __name__ == "__main__":
    main()
