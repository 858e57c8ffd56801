"""Round-4 TPU A/B: fuse 8 — the last rung of the fusion ladder.

Arms (paired interleaved vs the shipped defaults):

    head_f4   — shipped auto (fuse 4, 704-plane budget)
    head_f8   — MAX_FUSE_PLANES=1408 (128 slots x 11 planes = 22.5 MB
                scratch — Mosaic may reject; a failed compile is recorded)
    dense_f4  — shipped auto (fuse 4)
    dense_f8  — PHASE_FUSE=8 explicit (60 tiles pad to 64: 6.7% extra
                phase-A blocks vs pooling 32 samples/lane at the measured
                41.5% occupancy)

    python scripts/exp_round4_fuse8.py     # real TPU
"""

import dataclasses
import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

OUT = "FUSE8_AB_r04.json"


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

    # (name, scene-triple, PHASE_FUSE, MAX_FUSE_PLANES, chunk)
    plan = [("head_f4", head, "auto", 704, 1501),
            ("head_f8", head, 8, 1408, 1502),
            ("dense_f4", dense, "auto", 704, 1511),
            ("dense_f8", dense, 8, 704, 1512)]

    def sync(f):
        return np.asarray(f.image[0, 0])

    arms = {}
    report = {"probe_script": "scripts/exp_round4_fuse8.py",
              "date": "2026-08-19",
              "protocol": "paired same-session interleaved, 3 batteries x 3",
              "arms": []}
    old = (mk.PHASE_FUSE, mk.MAX_FUSE_PLANES)

    def set_knobs(fuse, planes):
        mk.PHASE_FUSE, mk.MAX_FUSE_PLANES = fuse, planes

    for name, (scene, cam, cfg), fuse, planes, chunk in plan:
        set_knobs(fuse, planes)
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        try:
            t0 = time.perf_counter()
            sync(r.render(scene, cam, seed=0))
            compile_s = time.perf_counter() - t0
        except Exception as e:
            set_knobs(*old)
            report["arms"].append({"probe": name, "fuse": str(fuse),
                                   "planes": planes, "error": repr(e)[:400]})
            print(json.dumps(report["arms"][-1]), flush=True)
            traceback.print_exc()
            continue
        arms[name] = (r, scene, cam, fuse, planes, [], [])
        print(json.dumps({"warm": name, "compile_s": round(compile_s, 1)}),
              flush=True)
    set_knobs(*old)

    seed = 1
    for battery in range(3):
        for name, (r, scene, cam, fuse, planes, times, rays) in arms.items():
            set_knobs(fuse, planes)
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(np.asarray(f.rays_traced)))
                seed += 1
            set_knobs(*old)
        print(json.dumps({"battery": battery}), flush=True)

    for name, (r, scene, cam, fuse, planes, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        mrays = float(np.mean(rays)) / p50 / 1e6
        report["arms"].append({"probe": name, "fuse": str(fuse),
                               "planes": planes,
                               "p50_ms": round(p50 * 1e3, 1),
                               "mrays": round(mrays, 1),
                               "n_frames": len(times)})
        print(json.dumps(report["arms"][-1]), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
