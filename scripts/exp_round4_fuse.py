"""Round-4 TPU A/B: block fusion (PHASE_FUSE — phase-split tile-tail pooling).

TITER_r04 measured phase-B lockstep occupancy at 61% (headline) / 41.5%
(dense, 4 spp): exhausted-sample lanes ride the tile straggler. Fusing F
consecutive pixel blocks into one kernel instance gives each lane F pixels'
parked samples, so the while-loop tail is paid once per F blocks (straggler
of per-lane sums, not sum of per-block stragglers). Costs that push back:
the restart fetch's one-hot select chain scales with F·spp slots, harvest
gains F-way routing masks, and the carry grows 4·(F−1) accumulator arrays.

Paired same-session interleaved A/B, 3 batteries x 3 frames:

    python scripts/exp_round4_fuse.py     # real TPU, ~20 min
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

OUT = "FUSE_AB_r04.json"


def main():
    from exp_large_scene import make_world
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    w = rtiow.final_scene(seed=42)
    head = (w.extract(with_bvh=False), w.camera_state(aspect=1920 / 1080),
            RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                         bounces=4, level=3))
    w = make_world()
    dense = (w.extract(with_bvh=False), w.camera_state(aspect=640 / 384),
             RenderConfig(width=640, height=384, samples_per_pixel=4,
                          bounces=4, level=3))

    plan = [("head_f1", head, 1, 1201), ("head_f2", head, 2, 1202),
            ("dense_f1", dense, 1, 1211), ("dense_f2", dense, 2, 1212),
            ("dense_f4", dense, 4, 1214)]

    def sync(f):
        return np.asarray(f.image[0, 0])

    arms = {}
    old = mk.PHASE_FUSE
    for name, (scene, cam, cfg), fuse, chunk in plan:
        mk.PHASE_FUSE = fuse
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        arms[name] = (r, scene, cam, fuse, [], [])
        print(json.dumps({"warm": name}), flush=True)

    report = {"probe_script": "scripts/exp_round4_fuse.py",
              "date": "2026-08-19",
              "protocol": "paired same-session interleaved, 3 batteries x 3",
              "arms": []}
    seed = 1
    for battery in range(3):
        for name, (r, scene, cam, fuse, times, rays) in arms.items():
            mk.PHASE_FUSE = fuse
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(np.asarray(f.rays_traced)))
                seed += 1
        print(json.dumps({"battery": battery}), flush=True)
    mk.PHASE_FUSE = old

    for name, (r, scene, cam, fuse, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        mrays = float(np.mean(rays)) / p50 / 1e6
        report["arms"].append({"probe": name, "fuse": fuse,
                               "p50_ms": round(p50 * 1e3, 1),
                               "mrays": round(mrays, 1),
                               "n_frames": len(times)})
        print(json.dumps(report["arms"][-1]), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
