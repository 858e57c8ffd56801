"""Round-4 TPU probe: per-segment fixed-cost cuts on the hw-PRNG path.

VERDICT r3 item 2: t_fix ~= 4.5 us/tile-iteration must reach <= 3.9 us for the
1 Grays/s requirement. The RNG term: scatter_draws generates 13 uniform rows
per bounce; HW_DRAWS_COMPACT regenerates only 9 and repacks the 8 ball
uniforms' spare low bits into the four low-precision values (u_metal, u_trans,
two ball radii) — per-row generation cost dominates the provider (round 1), so
row count is the lever. Distribution-preserving, different stream; the exact
path is untouched (test_perf_knobs-style pin not needed — the knob gates hw
only).

Paired same-session interleaved A/B (tunnel drift is +-3%, the size of most
effects):

    python scripts/exp_round4_tfix.py     # real TPU, ~10 min
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
    from bevyray_tpu.kernels.pallas import megakernel as mk

    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1920 / 1080)
    head = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                        bounces=4, level=3)

    def sync(f):
        return np.asarray(f.image[0, 0])

    arms = {}
    for name, compact, chunk in (("draws13", False, 971), ("draws9", True, 972)):
        mk.HW_DRAWS_COMPACT = compact
        r = PallasRenderer(dataclasses.replace(head, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        arms[name] = (r, compact, [], [])
        print(json.dumps({"warm": name}), flush=True)

    seed = 1
    for battery in range(3):
        for name, (r, compact, times, rays) in arms.items():
            mk.HW_DRAWS_COMPACT = compact
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1

    mk.HW_DRAWS_COMPACT = True
    for name, (_, _, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        print(json.dumps({
            "probe": f"tfix_{name}", "p50_ms": round(p50 * 1e3, 1),
            "mrays": round(np.mean(rays) / p50 / 1e6, 1),
            "n_frames": len(times),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
