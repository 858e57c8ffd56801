"""Round-4 TPU probe: dense-scene walk schedules (VERDICT item 4, take 2).

The hardware battery (GROUP_AB_r04.json) rejected finer groups for the dense
bench (gc48 −3%, gc32 −7% — per-step machinery beats byte savings), so the
remaining in-family lever is the walk SCHEDULE: dense straggler lanes run
~15 entered groups at gc96 (vs ~6 at the headline), and the shipped
REMASK_SCHEDULE=(5,) was tuned at the headline where K=10/12 REGRESS because
typical tiles finish in ≤8 steps. Dense tiles don't — deeper unrolls and a
second re-mask point may keep paying there (round 3 saw +0.5 Mrays/s from
more points before kd grouping landed).

Paired same-session interleaved battery over schedules at gc=96/median:

    python scripts/exp_round4_dense.py     # real TPU, ~25 min (5 compiles)
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
    from bevyray_tpu.kernels.pallas import megakernel as mk

    world = make_world()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=640 / 384)
    base = RenderConfig(width=640, height=384, samples_per_pixel=4,
                        bounces=4, level=3)

    def sync(f):
        return np.asarray(f.image[0, 0])

    plan = [("k5", (5,)), ("k8", (8,)), ("k10", (10,)),
            ("k5_10", (5, 10)), ("k14", (14,))]
    arms = {}
    old = mk.REMASK_SCHEDULE
    chunk = 1040
    for name, sched in plan:
        chunk += 1
        mk.REMASK_SCHEDULE = sched
        r = PallasRenderer(dataclasses.replace(base, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        arms[name] = (r, sched, [], [])
        print(json.dumps({"warm": name}), flush=True)

    seed = 1
    for battery in range(3):
        for name, (r, sched, times, rays) in arms.items():
            mk.REMASK_SCHEDULE = sched
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1

    mk.REMASK_SCHEDULE = old
    for name, (_, sched, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        print(json.dumps({
            "probe": f"dense_sched_{name}", "schedule": list(sched),
            "p50_ms": round(p50 * 1e3, 1),
            "mrays": round(np.mean(rays) / p50 / 1e6, 1),
            "n_frames": len(times),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
