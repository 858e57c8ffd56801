"""Round-5 phase-A attribution battery (VERDICT r4 item 4).

Round 3's phase-A "structural floor" (34.6 of 42.4 ms) was an ALL-ABLATED
aggregate — "raygen + gather + hit bookkeeping + loop machinery, no term >
~1 µs/tile-iter" — with no per-term evidence. This battery prices the named
terms DIRECTLY with the CSE-proof double-cost method (every probe folds a
structurally-distinct duplicate at 1e-30 weight; trip counts provably
unchanged), at bounces=0 under the phase split so phase B contributes
nothing:

    base       shipped program (the reference arm)
    dslwalk    + second primary-shortlist walk        (_DEBUG_DOUBLE_SLWALK)
    dslgather  + second shortlist-local attr gather   (_DEBUG_DOUBLE_SLGATHER)
    dhitmath   + second post-intersect geometry chain (_DEBUG_DOUBLE_HITMATH)
    dscatter   + second shade.scatter                 (_DEBUG_DOUBLE_SCATTER)
    ddraws     + second scatter-draw block            (_DEBUG_DOUBLE_DRAWS)
    draygen    + second primary-ray build             (_DEBUG_DOUBLE_RAYGEN)
    nost       − state parking ablated ("no_st" — subtractive; parking has
                 no double-cost twin since a second write is just an
                 overwrite of the same VMEM rows)

delta_ms(probe) − base ≈ that term's one-cost; the attribution table is
sum(terms) / base. Paired same-session interleaved (3 batteries × 3 frames,
unique sphere_chunk per arm so each knob set bakes into its own jit entry).

Run on the real TPU from the repo root:
    python scripts/exp_round5_phasea.py | tee /tmp/r05_phasea.out
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

PROBES = {
    "base": {},
    "dslwalk": {"_DEBUG_DOUBLE_SLWALK": True},
    "dslgather": {"_DEBUG_DOUBLE_SLGATHER": True},
    "dhitmath": {"_DEBUG_DOUBLE_HITMATH": True},
    "dscatter": {"_DEBUG_DOUBLE_SCATTER": True},
    "ddraws": {"_DEBUG_DOUBLE_DRAWS": True},
    "draygen": {"_DEBUG_DOUBLE_RAYGEN": True},
    "nost": {"_DEBUG_PHASEA": frozenset(["no_st"])},
}


def sync(f):
    return np.asarray(f.image[0, 0])


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=16 / 9)
    base_cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                            bounces=0, level=3)

    defaults = {k: getattr(mk, k) for p in PROBES.values() for k in p}

    def set_knobs(spec):
        for k, v in defaults.items():
            setattr(mk, k, spec.get(k, v))

    arms = {}
    chunk = 1200
    for arm, spec in PROBES.items():
        chunk += 1
        set_knobs(spec)
        r = PallasRenderer(dataclasses.replace(base_cfg, sphere_chunk=chunk))
        t0 = time.perf_counter()
        sync(r.render(scene, cam, seed=0))
        arms[arm] = (r, spec, [])
        print(json.dumps({"warm": arm, "compile_s":
                          round(time.perf_counter() - t0, 1)}), flush=True)

    seed = 1
    for battery in range(3):
        for arm, (r, spec, times) in arms.items():
            set_knobs(spec)
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                seed += 1
        print(json.dumps({"battery": battery}), flush=True)
    set_knobs({})

    n_samples = 8160.0          # 510 blocks x 16 spp (tile-samples per frame)
    rows, base_p50 = [], None
    for arm, (r, spec, times) in arms.items():
        p50 = float(np.percentile(times, 50)) * 1e3
        if arm == "base":
            base_p50 = p50
        d = None if base_p50 is None or arm == "base" else p50 - base_p50
        rows.append({"probe": arm, "p50_ms": round(p50, 2),
                     "delta_ms": None if d is None else round(d, 2),
                     "us_per_sample": (None if d is None
                                       else round(d * 1e3 / n_samples, 3))})
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"probe": "exp_round5_phasea", "bounces": 0,
                      "phaseA_tile_samples": n_samples, "rows": rows}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
