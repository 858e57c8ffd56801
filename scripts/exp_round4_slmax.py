"""Round-4 TPU probe: dense-scene shortlist capacity (SL_MAX 256 vs 512).

At SL_MAX=256 the dense bench's 8/60 blocks (329-387 frustum members) overflow:
they bounce-0 with the FULL candidate walk, and their overflow flag disables
the shortlist-local attribute tables for the whole frame (slattr requires zero
overflow), so every phase-A gather runs over all 5,120 columns. SL_MAX=512
removes both. Capacity stays the per-compile max block count, so the headline
(max 23 members) compiles identically — dense is the only scene that moves.

Paired same-session interleaved A/B at the shipped dense config:

    python scripts/exp_round4_slmax.py     # real TPU, ~15 min
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def main():
    from exp_large_scene import make_world
    from bevyray_tpu import RenderConfig
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import primary

    world = make_world()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=640 / 384)
    base = RenderConfig(width=640, height=384, samples_per_pixel=4,
                        bounces=4, level=3)

    def sync(f):
        return np.asarray(f.image[0, 0])

    arms = {}
    old = primary.SL_MAX
    for name, cap, chunk in (("slmax256", 256, 1051), ("slmax512", 512, 1052)):
        primary.SL_MAX = cap
        r = PallasRenderer(dataclasses.replace(base, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        arms[name] = (r, cap, [], [])
        print(json.dumps({"warm": name}), flush=True)

    seed = 1
    for battery in range(3):
        for name, (r, cap, times, rays) in arms.items():
            primary.SL_MAX = cap
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1

    primary.SL_MAX = old
    for name, (_, cap, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        print(json.dumps({
            "probe": f"dense_{name}", "p50_ms": round(p50 * 1e3, 1),
            "mrays": round(np.mean(rays) / p50 / 1e6, 1),
            "n_frames": len(times),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
