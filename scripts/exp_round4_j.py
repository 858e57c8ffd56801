"""Round-4 TPU probe: phase-B outer-loop unroll depth (PHASEB_UNROLL = J).

Round 3 measured J=2 at +0.9% over J=1 (the 13-array persistent carry's
per-while-step VMEM round-trip + cross-lane cond reduce is real but small at
~23 outer iterations/tile) and never tried deeper. J=3/J=4 cut the remaining
outer steps by 1/3 / 1/2 at the cost of up to J-1 wasted (exactly idempotent)
bounce iterations at each tile's end.

Paired same-session interleaved A/B (tunnel drift is +-3%):

    python scripts/exp_round4_j.py     # real TPU, ~15 min
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT = "PHASEBJ_AB_r04.json"


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
    for name, j, chunk in (("j2", 2, 981), ("j3", 3, 982), ("j4", 4, 983)):
        mk.PHASEB_UNROLL = j
        r = PallasRenderer(dataclasses.replace(head, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        arms[name] = (r, j, [], [])
        print(json.dumps({"warm": name}), flush=True)

    seed = 1
    for battery in range(3):
        for name, (r, j, times, rays) in arms.items():
            mk.PHASEB_UNROLL = j
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1
        print(json.dumps({"battery": battery}), flush=True)

    report = {"probe_script": "scripts/exp_round4_j.py", "date": "2026-08-19",
              "protocol": "paired same-session interleaved, 3 batteries x 3 frames",
              "arms": []}
    for name, (r, j, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50)) * 1e3
        mrays = float(np.median(rays) / np.percentile(times, 50) / 1e6)
        report["arms"].append({"probe": name, "J": j, "p50_ms": round(p50, 1),
                               "mrays": round(mrays, 1), "n_frames": len(times)})
        print(json.dumps(report["arms"][-1]), flush=True)
    mk.PHASEB_UNROLL = 3
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
