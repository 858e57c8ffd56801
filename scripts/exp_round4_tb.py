"""Round-4 TPU probe: decompose phase-B per-iteration cost (t_B ~= 10.15 us,
TITER_r04) at the SHIPPED operating point with CSE-proof DOUBLE-cost
ablations — the correct-image replacement for the confounded static-fetch
probe (SPEED_OF_LIGHT.md SS15).

Arms (each renders bit-identical images at timing precision; the paired
frame-time delta over base / iteration count IS the component's price):

  dfetch  — second restart fetch per phase-B iteration (63 slot compares
            x 10 plane selects at fuse 4); phase-B-only, so
            price = delta_ms / phaseB_iters (15,341 at the headline).
  ddraws  — second scatter_draws per bounce (6 hw-PRNG rows); runs in BOTH
            phases: price = delta_ms / (8,160 + 15,341).
  dgather — second attribute gather per bounce (re-prices the round-3
            ~1 us/iter number under fusion); both phases.

CLAUDE trap honored: direct probe runs thread has_emissive=False via
PallasRenderer (computes it), and every arm gets a unique sphere_chunk.

    python scripts/exp_round4_tb.py     # real TPU, ~15 min
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT = "TB_DECOMP_r04.json"


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    w = rtiow.final_scene(seed=42)
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1920 / 1080)
    cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                       bounces=4, level=3)

    def set_knobs(name):
        mk._DEBUG_DOUBLE_FETCH = name == "dfetch"
        mk._DEBUG_DOUBLE_DRAWS = name == "ddraws"
        mk._DEBUG_DOUBLE_GATHER = name == "dgather"

    def sync(f):
        return np.asarray(f.image[0, 0])

    plan = [("base", 1911), ("dfetch", 1912), ("ddraws", 1913),
            ("dgather", 1914)]
    arms = {}
    for name, chunk in plan:
        set_knobs(name)
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        assert r._has_emissive is False
        arms[name] = (r, [])
        print(json.dumps({"warm": name}), flush=True)
    set_knobs("base")

    report = {"probe_script": "scripts/exp_round4_tb.py",
              "date": "2026-08-19", "fuse": 4, "n_slots": 64,
              "phaseA_iters": 8160, "phaseB_iters": 15341,
              "protocol": "paired same-session interleaved, 3 batteries x 3",
              "arms": []}
    seed = 1
    for battery in range(3):
        for name, (r, times) in arms.items():
            set_knobs(name)
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                seed += 1
            set_knobs("base")
        print(json.dumps({"battery": battery}), flush=True)

    base_p50 = float(np.percentile(arms["base"][1], 50)) * 1e3
    for name, (r, times) in arms.items():
        p50 = float(np.percentile(times, 50)) * 1e3
        d = p50 - base_p50
        iters = {"base": None, "dfetch": 15341.0,
                 "ddraws": 8160.0 + 15341.0, "dgather": 8160.0 + 15341.0}[name]
        report["arms"].append({
            "probe": name, "p50_ms": round(p50, 1),
            "delta_ms": None if name == "base" else round(d, 1),
            "us_per_iter": (None if iters is None
                            else round(d * 1e3 / iters, 3)),
            "n_frames": len(times)})
        print(json.dumps(report["arms"][-1]), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
