"""TPU A/B: dense-scene candidate group size 96 (auto, 2-word masks) vs 48
(4-word masks) under kd grouping.

The multi-word mask generalization makes gc=48 legal at 5,120 padded spheres
(107 groups). Replay says kd gc=48 carries straggler-spheres 1024 vs gc=96's
1402 (−27% gathered bytes, the walk's measured bottleneck) at +6 straggler
steps (21.3 vs 14.6) and ~2 extra vector ops/step of word-select chain. This
battery decides whether the byte saving survives the step fixed costs.

    python scripts/exp_dense48_ab.py          # real TPU, ~10-20 min
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def main():
    from exp_large_scene import make_world
    from bevyray_tpu import RenderConfig
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer

    def sync(f):
        return np.asarray(f.image[0, 0])

    world = make_world()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=640 / 384)

    arms = {}
    for gc in (96, 48):
        cfg = RenderConfig(width=640, height=384, samples_per_pixel=4,
                           bounces=4, level=3, pallas_cand_size=gc)
        r = PallasRenderer(cfg)
        sync(r.render(scene, cam, seed=0))     # compile + warm
        arms[gc] = (r, [], [])

    seed = 1
    for battery in range(4):
        for gc, (r, times, rays) in arms.items():
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1

    for gc, (_, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        print(json.dumps({
            "probe": "dense48_ab", "gc": gc,
            "p50_ms": round(p50 * 1e3, 1),
            "mrays": round(np.mean(rays) / p50 / 1e6, 1),
            "n_frames": len(times),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
