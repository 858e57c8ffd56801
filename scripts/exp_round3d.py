"""Round-3d TPU probes: re-mask depth K at the headline + shipping check.

REMASK_AT=2 was the shipped default after exp_round3c; this battery brackets K
and then times the exact shipping configuration (defaults, auto everything)
the way bench.py does. (The knob was the int REMASK_AT when recorded; it later
became the tuple REMASK_SCHEDULE=(k,) — same one-point semantics, so re-runs
measure what the labels say. The shipped default moved to (5,) after
exp_round3e/f.)
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(render, n=8):
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

    uniq = [900]

    def run(name, cfg, k, n=6):
        uniq[0] += 1
        cfg = dataclasses.replace(cfg, sphere_chunk=uniq[0])
        old = mk.REMASK_SCHEDULE
        mk.REMASK_SCHEDULE = (k,)
        try:
            r = PallasRenderer(cfg)
            p50, rays = timeit(lambda s: r.render(scene, cam, seed=s), n=n)
        finally:
            mk.REMASK_SCHEDULE = old
        print(json.dumps({"probe": name, "p50_ms": round(p50 * 1e3, 2),
                          "mrays": round(rays / p50 / 1e6, 1)}), flush=True)

    run("head_remask3", head, 3)
    run("head_remask4", head, 4)
    # Shipping config exactly as bench.py sees it (defaults: auto cand=16,
    # REMASK_AT=2, split on) — 8 timed frames.
    run("head_ship_defaults", head, 2, n=8)
    return 0


if __name__ == "__main__":
    sys.exit(main())
