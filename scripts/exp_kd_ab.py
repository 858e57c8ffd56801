"""TPU A/B: kd cluster grouping vs morton runs, headline + dense scenes.

Paired same-session batteries (tunnel drift is one-sided ±3%, the size of
small effects — CLAUDE.md): all four programs compile first, then arms
alternate within each battery. Seeds vary per frame (the relay memoizes
identical executions).

    python scripts/exp_kd_ab.py          # real TPU, ~15-25 min
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def main():
    from exp_large_scene import make_world
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer

    def sync(f):
        return np.asarray(f.image[0, 0])

    arms = {}
    for tag, world, (w, h, spp) in (
            ("headline", rtiow.final_scene(seed=42), (1920, 1080, 16)),
            ("dense", make_world(), (640, 384, 4))):
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=w / h)
        for grouping in ("morton", "kd"):
            cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                               bounces=4, level=3, pallas_grouping=grouping)
            r = PallasRenderer(cfg)
            sync(r.render(scene, cam, seed=0))     # compile + warm
            arms[(tag, grouping)] = (r, scene, cam, [], [])

    seed = 1
    for battery in range(3):
        for key, (r, scene, cam, times, rays) in arms.items():
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1

    for (tag, grouping), (_, _, _, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        print(json.dumps({
            "probe": f"kd_ab_{tag}", "grouping": grouping,
            "p50_ms": round(p50 * 1e3, 1),
            "mrays": round(np.mean(rays) / p50 / 1e6, 1),
            "n_frames": len(times),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
