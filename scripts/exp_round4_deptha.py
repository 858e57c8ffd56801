"""Round-4 TPU A/B: depth accumulation in phase A (megakernel.DEPTH_IN_A).

First-hit depth is written only at bounce 0 (phase B restarts parked samples
at b_lane = 1), so a sample's depth is final when phase A parks it. The
DEPTH_IN_A arm accumulates it there for every active sample, which drops the
ST_FD plane (scratch + restart-fetch select chain) and removes fd + the
per-half dsums tuple from the phase-B while-carry: at the headline's fuse 4
that is 5 fewer carried (TILE_SUB, 128) arrays round-tripping VMEM per
iteration. Colors/segments are bit-identical between arms (pinned by
tests/test_fuse.py::test_depth_in_a_arms); depth agrees to f32-sum-order ulps.

Arms (shipped defaults otherwise, fuse "auto" → 4 at both scenes):

    head_parked / head_in_a    (1080p/16spp, 508 spheres)
    dense_parked / dense_in_a  (640x384/4spp, 5000 spheres)

Paired same-session interleaved, 3 batteries x 3 frames:

    python scripts/exp_round4_deptha.py     # real TPU, ~25 min
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

OUT = "DEPTHA_AB_r04.json"


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

    plan = [("head_parked", head, False, 1801), ("head_in_a", head, True, 1802),
            ("dense_parked", dense, False, 1811),
            ("dense_in_a", dense, True, 1812)]

    def sync(f):
        return np.asarray(f.image[0, 0])

    old = mk.DEPTH_IN_A

    arms = {}
    for name, (scene, cam, cfg), in_a, chunk in plan:
        mk.DEPTH_IN_A = in_a
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        arms[name] = (r, scene, cam, in_a, [], [])
        print(json.dumps({"warm": name, "depth_in_a": in_a}), flush=True)
    mk.DEPTH_IN_A = old

    report = {"probe_script": "scripts/exp_round4_deptha.py",
              "date": "2026-08-19",
              "protocol": "paired same-session interleaved, 3 batteries x 3",
              "arms": []}
    seed = 1
    for battery in range(3):
        for name, (r, scene, cam, in_a, times, rays) in arms.items():
            mk.DEPTH_IN_A = in_a
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(np.asarray(f.rays_traced)))
                seed += 1
            mk.DEPTH_IN_A = old
        print(json.dumps({"battery": battery}), flush=True)

    for name, (r, scene, cam, in_a, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        mrays = float(np.mean(rays)) / p50 / 1e6
        report["arms"].append({"probe": name, "depth_in_a": in_a,
                               "p50_ms": round(p50 * 1e3, 1),
                               "mrays": round(mrays, 1),
                               "n_frames": len(times)})
        print(json.dumps(report["arms"][-1]), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
