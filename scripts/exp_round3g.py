"""Round-3g TPU probes: phase-B outer-loop unroll + direct phase-A cost.

The outer persistent loop carries 13 (TILE_SUB,128) arrays; J bounce
iterations per while step amortize the carry's VMEM round-trip and the cond
reduce (the exp_round3f mechanism, applied one loop out). bounces=0 with the
split isolates phase A (raygen + shortlist b0 + parking + compaction) —
phase B is skipped entirely at bounces=0.
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

    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1920 / 1080)
    head = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                        bounces=4, level=3)

    uniq = [1000]

    def run(name, cfg, j, n=6):
        uniq[0] += 1
        cfg = dataclasses.replace(cfg, sphere_chunk=uniq[0])
        old = mk.PHASEB_UNROLL
        mk.PHASEB_UNROLL = j
        try:
            r = PallasRenderer(cfg)
            p50, rays = timeit(lambda s: r.render(scene, cam, seed=s), n=n)
        finally:
            mk.PHASEB_UNROLL = old
        print(json.dumps({"probe": name, "p50_ms": round(p50 * 1e3, 2),
                          "mrays": round(rays / p50 / 1e6, 1),
                          "rays_m": round(rays / 1e6, 2)}), flush=True)

    run("head_j1", head, 1)
    run("head_j2", head, 2)
    run("head_j3", head, 3)
    # Direct phase-A cost: bounces=0 skips phase B entirely under the split.
    run("phaseA_only_b0", dataclasses.replace(head, bounces=0), 1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
