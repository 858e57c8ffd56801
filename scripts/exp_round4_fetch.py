"""Round-4 TPU probe: price the phase-B restart-fetch select chain at the
SHIPPED operating point (fuse 4, 64 slots, 10-plane DEPTH_IN_A layout).

The fetch reads every parked slot's planes per while-iteration (63 slot
compares x 10 plane selects); _DEBUG_STATIC_FETCH keeps the sid select
chain (identical trip counts) but reads ONE static slot for the payload
fields — wrong images, timing only. The paired gap is the upper bound a
smarter fetch could win at the headline.

CLAUDE trap honored: direct render_tiles callers must thread
has_emissive=False or the arms run fuse 2 (14/13-plane layout).

    python scripts/exp_round4_fetch.py     # real TPU, ~10 min
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT = "FETCH_PROBE_r04.json"


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    w = rtiow.final_scene(seed=42)
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1920 / 1080)
    cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                       bounces=4, level=3)

    plan = [("onehot", False, 1901), ("static", True, 1902)]

    def sync(f):
        return np.asarray(f.image[0, 0])

    arms = {}
    for name, static, chunk in plan:
        mk._DEBUG_STATIC_FETCH = static
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        assert r._has_emissive is False  # refined in prepare(): fuse-4 layout
        arms[name] = (r, static, [])
        print(json.dumps({"warm": name}), flush=True)
    mk._DEBUG_STATIC_FETCH = False

    report = {"probe_script": "scripts/exp_round4_fetch.py",
              "date": "2026-08-19", "fuse": 4, "n_slots": 64,
              "protocol": "paired same-session interleaved, 3 batteries x 3",
              "arms": []}
    seed = 1
    for battery in range(3):
        for name, (r, static, times) in arms.items():
            mk._DEBUG_STATIC_FETCH = static
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                seed += 1
            mk._DEBUG_STATIC_FETCH = False
        print(json.dumps({"battery": battery}), flush=True)

    for name, (r, static, times) in arms.items():
        p50 = float(np.percentile(times, 50))
        report["arms"].append({"probe": name, "static_fetch": static,
                               "p50_ms": round(p50 * 1e3, 1),
                               "n_frames": len(times)})
        print(json.dumps(report["arms"][-1]), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
