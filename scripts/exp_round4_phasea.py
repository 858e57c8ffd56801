"""Round-4 TPU probe: phase-A status after the compact-draw cut.

VERDICT r3 item 5 wants the bounces=0 battery (phase A alone) under 40 ms.
Round 3 measured base 42.4-46.3 ms with an all-ablated floor of 34.6 ms
(exp_round3h). This re-measures base phase A at HEAD (HW_DRAWS_COMPACT now
generates 9 uniform rows per scatter instead of 13, and bounce-0's scatter is
part of phase A) plus the headline for context, paired same-session.

    python scripts/exp_round4_phasea.py     # real TPU, ~10 min
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer

    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1920 / 1080)

    def sync(f):
        return np.asarray(f.image[0, 0])

    arms = {}
    for name, bounces, chunk in (("phasea_b0", 0, 1061),
                                 ("headline", 4, 1062)):
        cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                           bounces=bounces, level=3, sphere_chunk=chunk)
        r = PallasRenderer(cfg)
        sync(r.render(scene, cam, seed=0))
        arms[name] = (r, [], [])
        print(json.dumps({"warm": name}), flush=True)

    seed = 1
    for battery in range(3):
        for name, (r, times, rays) in arms.items():
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1

    for name, (_, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        print(json.dumps({
            "probe": name, "p50_ms": round(p50 * 1e3, 1),
            "mrays": round(np.mean(rays) / p50 / 1e6, 1),
            "n_frames": len(times),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
