"""Round-5 TPU probe: per-term decomposition of the FLAT walk's t_iter.

TITER_r05 prices the flat family's phase B at 5.91 µs per body iteration
(16,103 tile-iters at the headline) and SOL §18b shows ALL remaining
headroom is t_iter — but its composition is only known from the NESTED
decomposition (TB_DECOMP2_r05), whose scheduling no longer applies. These
CSE-proof double-cost arms price the flat body's own terms directly:

  dstep    — second FLAT_WALK_STEPS chain of cwalk.step per iteration
             (_DEBUG_DOUBLE_STEP; re-run from the iteration's original
             walk state, origin +1e-30: same visit order and compares)
  dbuild   — second per-iteration fresh-mask build (_DEBUG_DOUBLE_MASKBUILD,
             flat hook)
  dfetch   — second restart fetch (_DEBUG_DOUBLE_FETCH, flat hook)
  dharvest — second dying-lane harvest (_DEBUG_DOUBLE_HARVEST, flat hook)
  dscatter — second shade.scatter (both phases, shared bounce_core hook)
  ddraws   — second scatter-draw block (both phases, shared hook)
  dgather  — second one-hot attribute gather (shared hook)

delta_ms(arm)/PHASE_B_ITERS ≈ that term's µs per flat iteration (dscatter/
ddraws/dgather spread over phase A's 8,160 iters too — reported both ways).

    python scripts/exp_round5_tbflat.py     # real TPU, ~8 compiles
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT = "TBFLAT_r05.json"

PHASE_A = 8160.0      # 510 blocks x 16 spp (TITER_r05)
PHASE_B = 16103.0     # flat body iterations (TITER_r05)

KNOB = {"dstep": "_DEBUG_DOUBLE_STEP",
        "dbuild": "_DEBUG_DOUBLE_MASKBUILD",
        "dfetch": "_DEBUG_DOUBLE_FETCH",
        "dharvest": "_DEBUG_DOUBLE_HARVEST",
        "dscatter": "_DEBUG_DOUBLE_SCATTER",
        "ddraws": "_DEBUG_DOUBLE_DRAWS",
        "dgather": "_DEBUG_DOUBLE_GATHER"}
ITERS = {"dstep": PHASE_B, "dbuild": PHASE_B, "dfetch": PHASE_B,
         "dharvest": PHASE_B, "dscatter": PHASE_A + PHASE_B,
         "ddraws": PHASE_A + PHASE_B, "dgather": PHASE_A + PHASE_B}


def sync(f):
    return np.asarray(f.image[0, 0])


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
        for k in KNOB.values():
            setattr(mk, k, False)
        if name != "base":
            setattr(mk, KNOB[name], True)

    arms = {}
    chunk = 1400
    for arm in ["base"] + list(KNOB):
        chunk += 1
        set_knobs(arm)
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        t0 = time.perf_counter()
        sync(r.render(scene, cam, seed=0))
        arms[arm] = (r, [])
        print(json.dumps({"warm": arm, "compile_s":
                          round(time.perf_counter() - t0, 1)}), flush=True)

    seed = 1
    for battery in range(3):
        for arm, (r, times) in arms.items():
            set_knobs(arm)
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                seed += 1
        print(json.dumps({"battery": battery}), flush=True)
    set_knobs("base")

    rows, base_p50 = [], None
    for arm, (r, times) in arms.items():
        p50 = float(np.percentile(times, 50)) * 1e3
        if arm == "base":
            base_p50 = p50
        d = None if arm == "base" else p50 - base_p50
        rows.append({
            "arm": arm, "p50_ms": round(p50, 2),
            "delta_ms": None if d is None else round(d, 2),
            "us_per_iter": (None if d is None
                            else round(d * 1e3 / ITERS[arm], 3))})
        print(json.dumps(rows[-1]), flush=True)

    report = {"probe_script": "scripts/exp_round5_tbflat.py",
              "date": "2026-08-20",
              "config": "headline 1080p/16spp/4b, flat defaults "
                        "(steps=4, J=4, fuse 4)",
              "phaseB_iters": PHASE_B, "phaseA_iters": PHASE_A,
              "rows": rows}
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
