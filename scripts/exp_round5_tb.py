"""Round-5 TPU probe: DIRECT decomposition of the t_B lump round 4 priced
only by subtraction ("walk + scatter math + harvest/carry/loop ~= 7.2 us",
SPEED_OF_LIGHT SS16 / VERDICT r4 item 1) — CSE-proof double-cost arms:

  dwalk    — second FULL candidate walk per phase-B bounce (mask build +
             unrolled steps + while loop); phase-B only.
  dmask    — second candidate-mask slab build, ONE per intersect call. A
             real walk runs build_mask twice (initial + the REMASK_SCHEDULE
             =(5,) mid-walk rebuild), so build total ≈ 2·dmask and
             steps + while machinery ≈ dwalk − 2·dmask.
  dscatter — second shade.scatter per bounce (both phases).
  dharvest — second dying-lane harvest per phase-B iteration.
  draygen  — second primary-ray build per phase-A sample.

Together with round 4's dfetch/dgather/ddraws (TB_DECOMP_r04) this covers
every named t_B term; the residual by subtraction is the loop carry/cond
machinery itself.

Iteration counts from TITER_r04 at the shipped headline operating point
(1080p/16spp, fuse 4): phase A 8,160 tile-iters, phase B 15,341.

    python scripts/exp_round5_tb.py     # real TPU, ~20 min
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT = "TB_DECOMP2_r05.json"

PHASE_A = 8160.0
PHASE_B = 15341.0


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    w = rtiow.final_scene(seed=42)
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1920 / 1080)
    cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                       bounces=4, level=3)

    KNOB = {"dwalk": "_DEBUG_DOUBLE_WALK",
            "dmask": "_DEBUG_DOUBLE_MASKBUILD",
            "dscatter": "_DEBUG_DOUBLE_SCATTER",
            "dharvest": "_DEBUG_DOUBLE_HARVEST",
            "draygen": "_DEBUG_DOUBLE_RAYGEN"}
    ITERS = {"dwalk": PHASE_B, "dmask": PHASE_B, "dscatter": PHASE_A + PHASE_B,
             "dharvest": PHASE_B, "draygen": PHASE_A}

    def set_knobs(name):
        for k in KNOB.values():
            setattr(mk, k, False)
        if name in KNOB:
            setattr(mk, KNOB[name], True)

    def sync(f):
        return np.asarray(f.image[0, 0])

    plan = [("base", 1951), ("dwalk", 1952), ("dmask", 1953),
            ("dscatter", 1954), ("dharvest", 1955), ("draygen", 1956)]
    arms = {}
    for name, chunk in plan:
        set_knobs(name)
        t0 = time.perf_counter()
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        assert r._has_emissive is False
        arms[name] = (r, [])
        print(json.dumps({"warm": name,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    set_knobs("base")

    report = {"probe_script": "scripts/exp_round5_tb.py",
              "date": "2026-08-19", "fuse": 4,
              "phaseA_iters": PHASE_A, "phaseB_iters": PHASE_B,
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
        iters = ITERS.get(name)
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
