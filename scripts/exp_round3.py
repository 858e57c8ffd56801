"""Round-3 TPU probes: phase-B attack surface at the headline config.

Variants (all RTiOW final scene, 1080p/16spp/4 bounces, hw RNG, real TPU):

  base       — round-2 shipping configuration (auto: gc=32 candidates + split)
  cand16     — two-word fine candidate groups (pallas_cand_size=16)
  batched    — _gather_attrs as ONE concat one-hot matmul (bit-identical)
  dblgather  — gather-cost ablation: a second CSE-proof attribute gather per
               bounce; delta vs base ≈ per-frame attribute-gather cost
  nosplit    — phase split off (refreshes the phase-A/B frame split numbers)
  5000 scene — auto (gc=96 after the two-word lift) vs forced gc=192 (round-2
               geometry) vs grouped walk

Each variant: warmup + p50 over 6 seeds (relay memoizes identical inputs —
seeds always vary). One JSON line per variant.

Module flags (GATHER_BATCHED/_DEBUG_DOUBLE_GATHER) are trace-time: each
flagged variant gets a config perturbed in a pallas-path-neutral field
(sphere_chunk) so the lru-cached jit can't reuse a stale trace.
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(render, n=6):
    f = render(0)
    np.asarray(f.image[0, 0])
    ts, rays = [], []
    for i in range(n):
        t0 = time.perf_counter()
        f = render(i + 1)
        np.asarray(f.image[0, 0])
        ts.append(time.perf_counter() - t0)
        rays.append(float(f.rays_traced))
    return float(np.percentile(ts, 50)), float(np.mean(rays))


def report(name, p50, rays, extra=None):
    row = {"probe": name, "p50_ms": round(p50 * 1e3, 2),
           "mrays": round(rays / p50 / 1e6, 1)}
    row.update(extra or {})
    print(json.dumps(row), flush=True)
    return row


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1920 / 1080)
    base_cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                            bounces=4, level=3)

    def run(name, cfg, extra=None):
        r = PallasRenderer(cfg)
        p50, rays = timeit(lambda s: r.render(scene, cam, seed=s))
        return report(name, p50, rays, extra)

    run("base", base_cfg)
    run("cand16", dataclasses.replace(base_cfg, pallas_cand_size=16))

    mk.GATHER_BATCHED = True
    run("batched_gather", dataclasses.replace(base_cfg, sphere_chunk=513))
    mk.GATHER_BATCHED = False

    mk._DEBUG_DOUBLE_GATHER = True
    run("double_gather", dataclasses.replace(base_cfg, sphere_chunk=514))
    mk._DEBUG_DOUBLE_GATHER = False

    run("nosplit", dataclasses.replace(base_cfg, pallas_primary="off"))
    run("nosplit_cand16", dataclasses.replace(base_cfg, pallas_primary="off",
                                              pallas_cand_size=16))

    # ---- 5000-sphere large scene -----------------------------------------
    rng = np.random.RandomState(3)
    from bevyray_tpu import (RaytracedCamera, RaytracedSphere, Raytracing,
                             StandardMaterial, Transform)
    from bevyray_tpu.scene.world import World
    big = World()
    big.set_camera(Transform.from_xyz(0, 6, 30).looking_at((0, 0, 0)),
                   camera=RaytracedCamera(level=Raytracing.PURE))
    big.spawn_sphere(Transform.from_xyz(0, -1000, 0), RaytracedSphere(1000.0),
                     StandardMaterial(base_color=(0.5, 0.5, 0.5)))
    for _ in range(4999):
        p = rng.uniform(-40, 40, 3)
        p[1] = rng.uniform(0.2, 3.0)
        big.spawn_sphere(Transform.from_xyz(*p),
                         RaytracedSphere(float(rng.uniform(0.15, 0.5))),
                         StandardMaterial(base_color=tuple(rng.rand(3)),
                                          metallic=float(rng.rand() < 0.2)))
    bscene = big.extract(with_bvh=False)
    bcam = big.camera_state(aspect=1920 / 1080)

    def runbig(name, cfg):
        r = PallasRenderer(cfg)
        p50, rays = timeit(lambda s: r.render(bscene, bcam, seed=s), n=4)
        return report(name, p50, rays, {"n_spheres": big.n_spheres})

    runbig("big5000_auto_gc96", base_cfg)
    runbig("big5000_gc192", dataclasses.replace(base_cfg,
                                                pallas_cand_size=192))
    runbig("big5000_grouped", dataclasses.replace(base_cfg,
                                                  pallas_intersect="grouped"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
