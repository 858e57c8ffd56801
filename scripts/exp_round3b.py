"""Round-3b TPU probes: popularity pre-brute thresholds × candidate sizes.

Headline (1080p/16spp final scene) and the round-2-comparable dense 5000-sphere
scene (exp_large_scene.make_world, 640×384/4spp — README's large-scene row).

Module flags are trace-time; every variant perturbs sphere_chunk (neutral for
the pallas path) to bust the lru-cached jit.
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


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk
    from exp_large_scene import make_world

    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1920 / 1080)
    base = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                        bounces=4, level=3)

    uniq = [0]

    def run(name, cfg, frac, sc_, cm, n=6, extra=None):
        uniq[0] += 1
        cfg = dataclasses.replace(cfg, sphere_chunk=512 + uniq[0])
        old = mk.POP_BRUTE_FRAC
        mk.POP_BRUTE_FRAC = frac
        try:
            r = PallasRenderer(cfg)
            p50, rays = timeit(lambda s: r.render(sc_, cm, seed=s), n=n)
        finally:
            mk.POP_BRUTE_FRAC = old
        row = {"probe": name, "p50_ms": round(p50 * 1e3, 2),
               "mrays": round(rays / p50 / 1e6, 1)}
        row.update(extra or {})
        print(json.dumps(row), flush=True)

    c16 = dataclasses.replace(base, pallas_cand_size=16)
    run("c16_pb0", c16, 0.0, scene, cam)
    run("c16_pb32", c16, 1 / 32, scene, cam)
    run("c16_pb16", c16, 1 / 16, scene, cam)
    run("c16_pb8", c16, 1 / 8, scene, cam)
    run("c32_pb16", base, 1 / 16, scene, cam)

    big = make_world()
    bscene = big.extract(with_bvh=False)
    bcam = big.camera_state(aspect=640 / 384)
    bcfg = RenderConfig(width=640, height=384, samples_per_pixel=4, bounces=4,
                        level=3)
    run("big_auto96_pb0", bcfg, 0.0, bscene, bcam, n=5)
    run("big_auto96_pb16", bcfg, 1 / 16, bscene, bcam, n=5)
    run("big_auto96_pb8", bcfg, 1 / 8, bscene, bcam, n=5)
    run("big_gc192_pb16", dataclasses.replace(bcfg, pallas_cand_size=192),
        1 / 16, bscene, bcam, n=5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
