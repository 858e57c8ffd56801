"""Round-4 TPU A/B (confirm): RETUNE_AB_r04 said k5_j2 and k8_j3 both beat
the shipped k5_j3 under fuse 4 — this battery re-tests those two winners
against the control and adds the untested k8_j2 corner.

    python scripts/exp_round4_retune2.py     # real TPU
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

OUT = "RETUNE2_AB_r04.json"


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    w = rtiow.final_scene(seed=42)
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1920 / 1080)
    cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                       bounces=4, level=3)

    # (name, REMASK_SCHEDULE, PHASEB_UNROLL, chunk) — control first.
    plan = [("k5_j3", (5,), 3, 1701),
            ("k8_j3", (8,), 3, 1702),
            ("k5_j2", (5,), 2, 1703),
            ("k8_j2", (8,), 2, 1704)]

    def sync(f):
        return np.asarray(f.image[0, 0])

    old = (mk.REMASK_SCHEDULE, mk.PHASEB_UNROLL)

    arms = {}
    report = {"probe_script": "scripts/exp_round4_retune2.py",
              "date": "2026-08-19",
              "protocol": "paired same-session interleaved, 3 batteries x 3",
              "arms": []}
    for name, sched, j, chunk in plan:
        mk.REMASK_SCHEDULE, mk.PHASEB_UNROLL = sched, j
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        arms[name] = (r, sched, j, [], [])
        print(json.dumps({"warm": name}), flush=True)
    mk.REMASK_SCHEDULE, mk.PHASEB_UNROLL = old

    seed = 1
    for battery in range(3):
        for name, (r, sched, j, times, rays) in arms.items():
            mk.REMASK_SCHEDULE, mk.PHASEB_UNROLL = sched, j
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(np.asarray(f.rays_traced)))
                seed += 1
            mk.REMASK_SCHEDULE, mk.PHASEB_UNROLL = old
        print(json.dumps({"battery": battery}), flush=True)

    for name, (r, sched, j, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        mrays = float(np.mean(rays)) / p50 / 1e6
        report["arms"].append({"probe": name, "remask": list(sched),
                               "unroll_j": j,
                               "p50_ms": round(p50 * 1e3, 1),
                               "mrays": round(mrays, 1),
                               "n_frames": len(times)})
        print(json.dumps(report["arms"][-1]), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
