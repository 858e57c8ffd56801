"""Round-5 TPU probe: dense-scene fuse 8 (VERDICT r4 item 5 — low-spp
occupancy has plane-budget slack: 8 blocks × 4 spp × 10 planes = 320 of the
704-plane budget).

Round 4's fuse-8 attempt crashed the remote compile helper AT 16 SPP (64
slots; program size, not scratch — FUSE8_AB_r04). The dense bench runs 4 spp
(32 slots — the same slot count the headline compiles fine at fuse 2), and
the program has shrunk since (DEPTH_IN_A dropped 5 carry arrays; compact
draws): re-try at dense only, nested and flat. A compile crash here is a
recorded wall, not a session-killer — run this probe LAST in a session.

    python scripts/exp_round5_fuse8.py      # real TPU, 3 compiles
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
    from exp_round5_flat import run_battery, sync
    from bevyray_tpu import RenderConfig
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    world = make_world()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=640 / 384)
    base = RenderConfig(width=640, height=384, samples_per_pixel=4,
                        bounces=4, level=3)

    arms = {}
    chunk = 1200
    plan = [("fuse4_ship", (4, False, 1)), ("fuse8_nested", (8, False, 1)),
            ("fuse8_flat", (8, True, 1))]
    for arm, (fuseval, flat, steps) in plan:
        chunk += 1
        mk.PHASE_FUSE = fuseval
        mk.PHASEB_FLAT = flat
        mk.FLAT_WALK_STEPS = steps
        r = PallasRenderer(dataclasses.replace(base, sphere_chunk=chunk))
        t0 = time.perf_counter()
        try:
            sync(r.render(scene, cam, seed=0))
        except Exception as e:  # compile crash = the recorded wall
            print(json.dumps({"arm": arm, "compile_error": repr(e)[:300]}),
                  flush=True)
            continue
        arms[arm] = (r, fuseval, flat, steps, [], [])
        print(json.dumps({"warm": arm,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    seed = 1
    for battery in range(3):
        for arm, (r, fuseval, flat, steps, times, rays) in arms.items():
            mk.PHASE_FUSE = fuseval
            mk.PHASEB_FLAT = flat
            mk.FLAT_WALK_STEPS = steps
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1
        print(json.dumps({"battery": battery}), flush=True)

    for arm, (r, fuseval, flat, steps, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        print(json.dumps({"arm": arm, "p50_ms": round(p50 * 1e3, 2),
                          "mrays": round(np.mean(rays) / p50 / 1e6, 2)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
