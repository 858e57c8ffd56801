"""Round-3e TPU probes: re-mask schedule search at the headline.

exp_round3d measured K=4 > K=3 > K=2 (single re-mask, monotone); this battery
goes deeper and tries multi-point schedules.
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
    head = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                        bounces=4, level=3)

    uniq = [950]

    def run(name, cfg, sched, sc_, cm, n=6):
        uniq[0] += 1
        cfg = dataclasses.replace(cfg, sphere_chunk=uniq[0])
        old = mk.REMASK_SCHEDULE
        mk.REMASK_SCHEDULE = sched
        try:
            r = PallasRenderer(cfg)
            p50, rays = timeit(lambda s: r.render(sc_, cm, seed=s), n=n)
        finally:
            mk.REMASK_SCHEDULE = old
        print(json.dumps({"probe": name, "p50_ms": round(p50 * 1e3, 2),
                          "mrays": round(rays / p50 / 1e6, 1),
                          "rays_m": round(rays / 1e6, 2)}), flush=True)

    run("head_k5", head, (5,), scene, cam)
    run("head_k6", head, (6,), scene, cam)
    run("head_k8", head, (8,), scene, cam)
    run("head_k24", head, (2, 4), scene, cam)
    run("head_k246", head, (2, 4, 6), scene, cam)
    run("head_k36", head, (3, 6), scene, cam)

    big = make_world()
    bscene = big.extract(with_bvh=False)
    bcam = big.camera_state(aspect=640 / 384)
    bcfg = RenderConfig(width=640, height=384, samples_per_pixel=4, bounces=4,
                        level=3)
    run("big_k4", bcfg, (4,), bscene, bcam, n=5)
    run("big_k246", bcfg, (2, 4, 6), bscene, bcam, n=5)
    run("big_k2468", bcfg, (2, 4, 6, 8), bscene, bcam, n=5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
