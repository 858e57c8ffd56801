"""Round-5 final hardware battery: flat-body t_iter decomposition + the
FLAT_STEP_MERGE A/B + an inline fresh-defaults bench, all in ONE process
(the tunnel compile helper's first compile in a fresh process costs
~10-26 min this round — batch everything).

Arms (headline 1080p/16spp/4b, flat defaults steps=4/J=auto/fuse 4):

  base     — shipped defaults (the reference point for every delta)
  merge    — FLAT_STEP_MERGE=True: the iteration's 4 one-hot gathers fold
             into one wide matmul per chunk (_CandidateWalk.step_multi,
             bit-identical by the lex-min argument, tests/test_flat_walk.py)
  dstep    — second FLAT_WALK_STEPS chain per iteration (CSE-proof)
  dfetch   — second restart fetch
  dbuild   — second fresh-mask build
  dharvest — second dying-lane harvest

delta_ms(arm)/PHASE_B_ITERS ≈ the term's µs per flat iteration. Together
with the phase-shared terms already priced in TB_DECOMP2_r05 (scatter
0.27, draws 0.42, gather 0.76 µs/iter — unchanged by the flat walk), this
covers the full t_iter budget with DIRECT terms (VERDICT r4 item 1).

With --dense, adds base/merge arms at the 5000-sphere 4 spp point.
Always ends with a fresh 30-frame bench at CURRENT defaults (merge stays
OFF unless it won both scales; flip by hand after reading MERGE_AB_r05).

    python scripts/exp_round5_final.py [--dense]
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

PHASE_A = 8160.0      # 510 blocks x 16 spp (TITER_r05)
PHASE_B = 16103.0     # flat body iterations at the headline (TITER_r05)

KNOB = {"dstep": "_DEBUG_DOUBLE_STEP",
        "dfetch": "_DEBUG_DOUBLE_FETCH",
        "dbuild": "_DEBUG_DOUBLE_MASKBUILD",
        "dharvest": "_DEBUG_DOUBLE_HARVEST"}


def sync(f):
    return np.asarray(f.image[0, 0])


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    dense = "--dense" in sys.argv

    w = rtiow.final_scene(seed=42)
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1920 / 1080)
    cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                       bounces=4, level=3)

    def set_knobs(arm):
        for k in KNOB.values():
            setattr(mk, k, False)
        mk.FLAT_STEP_MERGE = arm == "merge"
        if arm in KNOB:
            setattr(mk, KNOB[arm], True)

    arm_names = ["base", "merge", "dstep", "dfetch", "dbuild", "dharvest"]
    arms = {}
    chunk = 1500
    for arm in arm_names:
        chunk += 1
        set_knobs(arm)
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        t0 = time.perf_counter()
        try:
            sync(r.render(scene, cam, seed=0))
        except Exception as e:  # keep the battery alive if one arm breaks
            print(json.dumps({"arm": arm, "error": repr(e)[:200]}),
                  flush=True)
            continue
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
    for arm in arm_names:
        if arm not in arms:
            continue
        r, times = arms[arm]
        p50 = float(np.percentile(times, 50)) * 1e3
        if arm == "base":
            base_p50 = p50
        d = None if base_p50 is None or arm == "base" else p50 - base_p50
        rows.append({
            "arm": arm, "p50_ms": round(p50, 2),
            "delta_ms": None if d is None else round(d, 2),
            "us_per_flat_iter": (None if d is None or arm == "merge"
                                 else round(d * 1e3 / PHASE_B, 3))})
        print(json.dumps(rows[-1]), flush=True)

    with open("TBFLAT_r05.json", "w") as f:
        json.dump({"probe_script": "scripts/exp_round5_final.py",
                   "date": "2026-08-21",
                   "config": "headline 1080p/16spp/4b, flat defaults "
                             "(steps=4, J=auto, fuse 4)",
                   "phaseB_iters": PHASE_B, "phaseA_iters": PHASE_A,
                   "phase_shared_terms_from_nested_us_per_iter":
                       {"dscatter": 0.271, "ddraws": 0.42, "dgather": 0.76,
                        "source": "TB_DECOMP2_r05.json (unchanged by flat)"},
                   "rows": rows}, f, indent=1)
    print(json.dumps({"wrote": "TBFLAT_r05.json"}), flush=True)

    dense_rows = []
    if dense:
        from exp_large_scene import make_world
        wd = make_world()
        sd = wd.extract(with_bvh=False)
        cd = wd.camera_state(aspect=640 / 384)
        cfgd = RenderConfig(width=640, height=384, samples_per_pixel=4,
                            bounces=4, level=3)
        darms = {}
        for arm in ["base", "merge"]:
            chunk += 1
            set_knobs(arm)
            r = PallasRenderer(dataclasses.replace(cfgd, sphere_chunk=chunk))
            t0 = time.perf_counter()
            try:
                sync(r.render(sd, cd, seed=0))
            except Exception as e:
                print(json.dumps({"arm": "dense_" + arm,
                                  "error": repr(e)[:200]}), flush=True)
                continue
            darms[arm] = (r, [])
            print(json.dumps({"warm": "dense_" + arm, "compile_s":
                              round(time.perf_counter() - t0, 1)}),
                  flush=True)
        for battery in range(3):
            for arm, (r, times) in darms.items():
                set_knobs(arm)
                for _ in range(3):
                    t0 = time.perf_counter()
                    f = r.render(sd, cd, seed=seed)
                    sync(f)
                    times.append(time.perf_counter() - t0)
                    seed += 1
        for arm, (r, times) in darms.items():
            p50 = float(np.percentile(times, 50)) * 1e3
            dense_rows.append({"arm": "dense_" + arm,
                               "p50_ms": round(p50, 2)})
            print(json.dumps(dense_rows[-1]), flush=True)

    merge_rows = [r for r in rows if r["arm"] in ("base", "merge")]
    with open("MERGE_AB_r05.json", "w") as f:
        json.dump({"probe_script": "scripts/exp_round5_final.py",
                   "date": "2026-08-21",
                   "knob": "megakernel.FLAT_STEP_MERGE",
                   "headline": merge_rows, "dense": dense_rows}, f, indent=1)
    print(json.dumps({"wrote": "MERGE_AB_r05.json"}), flush=True)

    # Fresh-defaults bench (same process: arms above used distinct
    # sphere_chunk values so this is its own jit cache entry — but the
    # process-level tunnel warmup is already paid).
    set_knobs("base")
    rb = PallasRenderer(cfg)
    sync(rb.render(scene, cam, seed=0))
    times = []
    for i in range(30):
        t0 = time.perf_counter()
        f = rb.render(scene, cam, seed=100 + i)
        sync(f)
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50)) * 1e3
    print(json.dumps({"bench_p50_ms": round(p50, 2),
                      "note": "run bench.py for the canonical Mrays/s"}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
