"""Round-4 TPU A/B: fuse 4 at the headline via a raised slot budget.

The compact 11-plane layout (STLAYOUT_AB_r04) shrinks the parked-state
scratch to 11/15 of its round-3 footprint, and grid padding lifts the
510-tile divisibility wall — so MAX_FUSE_SLOTS=64 lets the 1080p/16spp
headline fuse 4 blocks (64 slots x 11 planes = 11.3 MB scratch; the proven
round-3 footprint was 7.9 MB, so Mosaic may reject — a failed compile is
recorded, not fatal). The prize: phase-B lockstep occupancy pools over 64
samples/lane instead of 32 (TITER_r04 measured 61% at fuse 2's 32).

Paired same-session interleaved, 3 batteries x 3 frames:

    python scripts/exp_round4_slots.py     # real TPU
"""

import dataclasses
import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

OUT = "SLOTS_AB_r04.json"


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    w = rtiow.final_scene(seed=42)
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1920 / 1080)
    cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                       bounces=4, level=3)

    plan = [("head_s32", 480, 1401), ("head_s64", 704, 1402)]  # MAX_FUSE_PLANES arms

    def sync(f):
        return np.asarray(f.image[0, 0])

    arms = {}
    report = {"probe_script": "scripts/exp_round4_slots.py",
              "date": "2026-08-19",
              "protocol": "paired same-session interleaved, 3 batteries x 3",
              "arms": []}
    old = mk.MAX_FUSE_PLANES
    for name, slots, chunk in plan:
        mk.MAX_FUSE_PLANES = slots
        fuse = mk._resolve_fuse(510, 16, True, 512, 11)
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        try:
            t0 = time.perf_counter()
            sync(r.render(scene, cam, seed=0))
            compile_s = time.perf_counter() - t0
        except Exception as e:  # VMEM overflow etc. — record, keep going
            mk.MAX_FUSE_PLANES = old
            report["arms"].append({"probe": name, "planes": slots,
                                   "fuse": fuse, "error": repr(e)[:400]})
            print(json.dumps(report["arms"][-1]), flush=True)
            traceback.print_exc()
            continue
        arms[name] = (r, slots, fuse, [], [])
        print(json.dumps({"warm": name, "fuse": fuse,
                          "compile_s": round(compile_s, 1)}), flush=True)
    mk.MAX_FUSE_PLANES = old

    seed = 1
    for battery in range(3):
        for name, (r, slots, fuse, times, rays) in arms.items():
            mk.MAX_FUSE_PLANES = slots
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(np.asarray(f.rays_traced)))
                seed += 1
            mk.MAX_FUSE_PLANES = old
        print(json.dumps({"battery": battery}), flush=True)

    for name, (r, slots, fuse, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        mrays = float(np.mean(rays)) / p50 / 1e6
        report["arms"].append({"probe": name, "planes": slots, "fuse": fuse,
                               "p50_ms": round(p50 * 1e3, 1),
                               "mrays": round(mrays, 1),
                               "n_frames": len(times)})
        print(json.dumps(report["arms"][-1]), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
