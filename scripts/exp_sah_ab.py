"""TPU A/B: SAH kd splits vs shipped median kd splits.

Replay pre-screen (exp_kd_sah.py): SAH cuts headline mean entered groups
2.53 -> 2.11 (-17%) and straggler 8.4 -> 7.8; dense parity. This battery
measures whether that survives per-step fixed costs on hardware. Paired
same-session batteries (tunnel drift +-3%); KD_RULE is read at
cached_order call time, so each arm sets it around its calls (the order
LRU keys on the rule, so arms don't evict each other).

    python scripts/exp_sah_ab.py          # real TPU, ~15-25 min
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
    from bevyray_tpu.kernels.pallas import grouping

    def sync(f):
        return np.asarray(f.image[0, 0])

    arms = {}
    for tag, world, (w, h, spp) in (
            ("headline", rtiow.final_scene(seed=42), (1920, 1080, 16)),
            ("dense", make_world(), (640, 384, 4))):
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=w / h)
        for rule in ("median", "sah"):
            cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                               bounces=4, level=3)
            r = PallasRenderer(cfg)
            grouping.KD_RULE = rule
            sync(r.render(scene, cam, seed=0))     # compile + warm
            arms[(tag, rule)] = (r, scene, cam, [], [])

    seed = 1
    for battery in range(3):
        for (tag, rule), (r, scene, cam, times, rays) in arms.items():
            grouping.KD_RULE = rule
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1

    grouping.KD_RULE = "median"
    for (tag, rule), (_, _, _, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        print(json.dumps({
            "probe": f"sah_ab_{tag}", "rule": rule,
            "p50_ms": round(p50 * 1e3, 1),
            "mrays": round(np.mean(rays) / p50 / 1e6, 1),
            "n_frames": len(times),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
