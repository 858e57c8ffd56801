"""Round-3f TPU probes: is the re-mask win unroll or pruning? Plus deeper K."""

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

    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1920 / 1080)
    head = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                        bounces=4, level=3)

    uniq = [970]

    def run(name, sched, rebuild=True, n=6):
        uniq[0] += 1
        cfg = dataclasses.replace(head, sphere_chunk=uniq[0])
        olds, oldr = mk.REMASK_SCHEDULE, mk._REMASK_REBUILD
        mk.REMASK_SCHEDULE, mk._REMASK_REBUILD = sched, rebuild
        try:
            r = PallasRenderer(cfg)
            p50, rays = timeit(lambda s: r.render(scene, cam, seed=s), n=n)
        finally:
            mk.REMASK_SCHEDULE, mk._REMASK_REBUILD = olds, oldr
        print(json.dumps({"probe": name, "p50_ms": round(p50 * 1e3, 2),
                          "mrays": round(rays / p50 / 1e6, 1),
                          "rays_m": round(rays / 1e6, 2)}), flush=True)

    run("head_k8_norebuild", (8,), rebuild=False)
    run("head_k10", (10,))
    run("head_k12", (12,))
    return 0


if __name__ == "__main__":
    sys.exit(main())
