"""Round-4 TPU A/B: compact parked-state layout (megakernel._st_layout).

The phase-split scratch stores 15 logical fields per slot; round 4 derives
ST_W from ST_SID (always) and drops the three radiance planes on
non-emissive scenes (live parked radiance is exactly 0 there), so the
shipped layout is 11 planes: scratch −27%, restart-fetch select chain −27%,
and the while carry loses 4 arrays (w + radiance triple). This battery
prices the layout against the old full one at the shipped fuse points.

Arms (forced "full" monkeypatches scene_has_emissive → True, which is
bit-identical — tests/test_fuse.py::test_st_layout_bit_identical):

    head_full / head_compact   (1080p/16spp, fuse 2)
    dense_full / dense_compact (640x384/4spp, 5000 spheres, fuse 4)

Paired same-session interleaved, 3 batteries x 3 frames:

    python scripts/exp_round4_stlayout.py     # real TPU, ~25 min
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

OUT = "STLAYOUT_AB_r04.json"


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

    plan = [("head_full", head, True, 1301), ("head_compact", head, False, 1302),
            ("dense_full", dense, True, 1311),
            ("dense_compact", dense, False, 1312)]

    def sync(f):
        return np.asarray(f.image[0, 0])

    real_probe = mk.scene_has_emissive

    def with_layout(force_full, fn):
        mk.scene_has_emissive = ((lambda scene: True) if force_full
                                 else real_probe)
        try:
            return fn()
        finally:
            mk.scene_has_emissive = real_probe

    arms = {}
    for name, (scene, cam, cfg), force_full, chunk in plan:
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        with_layout(force_full, lambda: sync(r.render(scene, cam, seed=0)))
        assert r._has_emissive is force_full
        arms[name] = (r, scene, cam, force_full, [], [])
        print(json.dumps({"warm": name, "full_layout": force_full}),
              flush=True)

    report = {"probe_script": "scripts/exp_round4_stlayout.py",
              "date": "2026-08-19",
              "protocol": "paired same-session interleaved, 3 batteries x 3",
              "arms": []}
    seed = 1
    for battery in range(3):
        for name, (r, scene, cam, force_full, times, rays) in arms.items():
            for _ in range(3):
                t0 = time.perf_counter()
                f = with_layout(force_full,
                                lambda: r.render(scene, cam, seed=seed))
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(np.asarray(f.rays_traced)))
                seed += 1
        print(json.dumps({"battery": battery}), flush=True)

    for name, (r, scene, cam, force_full, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        mrays = float(np.mean(rays)) / p50 / 1e6
        report["arms"].append({"probe": name, "full_layout": force_full,
                               "p50_ms": round(p50 * 1e3, 1),
                               "mrays": round(mrays, 1),
                               "n_frames": len(times)})
        print(json.dumps(report["arms"][-1]), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
