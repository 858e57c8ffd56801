"""Round-5 re-run of the COUNT_ITERS probe under the FLAT walk defaults.

Semantics change vs round 4: a lane-iteration now runs FLAT_WALK_STEPS
candidate steps and finished lanes restart immediately, so "occupancy"
(segments / lane-iterations) reads as 1 / (mean flat iterations per
segment) — it can exceed the nested lockstep numbers by design. Original
round-4 notes below.

Round-4 TPU probe: DIRECT per-tile-iteration cost + lockstep occupancy.

The SPEED_OF_LIGHT ceiling model prices phase B as
``t_iter = t_fix + steps x t_step`` with t_fix ~= 4.5 us estimated
INDIRECTLY (round-2 ablations). After the round-4 draw cuts
(HW_DRAWS_COMPACT 13->9 rows, HW_DRAWS_ZPHI 9->6) the model's t_fix term is
stale. This probe measures the real thing: megakernel.COUNT_ITERS repurposes
the rays_traced counter to add 1.0 per lane per trace-loop iteration
(images stay correct), so

    tile_iters       = rays_traced(iters arm) / TILE
    occupancy        = rays_traced(normal) / rays_traced(iters)
    us_per_tile_iter = frame_ms * 1000 / tile_iters      (paired normal arm)

Three scenes bracket the intersect term:
  - config2 scene (4 spheres, plain persistent loop): intersect ~= free, so
    us_per_tile_iter IS t_fix + raygen-restart share — the direct post-cut
    t_fix upper bound.
  - headline (508 spheres, phase split): per-iter cost of the shipped
    phase-B walk; subtract PHASEA_r04's 45.1 ms before dividing by B iters.
  - dense (5000 spheres): same for the dense operating point.

Paired same-session interleaved A/B; the iters arm re-jits via a distinct
sphere_chunk (the knob is traced into the program).

    python scripts/exp_round5_titer.py     # real TPU, ~15 min
"""

import dataclasses
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

OUT = "TITER_r05.json"


def main():
    from exp_large_scene import make_world
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    scenes = {}
    w = rtiow.final_scene(seed=42)
    scenes["headline"] = (w.extract(with_bvh=False),
                          w.camera_state(aspect=1920 / 1080),
                          RenderConfig(width=1920, height=1080,
                                       samples_per_pixel=16, bounces=4,
                                       level=3))
    w = rtiow.material_test_scene()
    scenes["config2_1080p"] = (w.extract(with_bvh=False),
                               w.camera_state(aspect=1920 / 1080),
                               RenderConfig(width=1920, height=1080,
                                            samples_per_pixel=16, bounces=8,
                                            level=3))
    w = make_world()
    scenes["dense"] = (w.extract(with_bvh=False),
                       w.camera_state(aspect=640 / 384),
                       RenderConfig(width=640, height=384,
                                    samples_per_pixel=4, bounces=4, level=3))

    def sync(f):
        return np.asarray(f.image[0, 0])

    report = {"probe_script": "scripts/exp_round5_titer.py",
              "date": "2026-08-20",
              "protocol": "paired same-session interleaved, 3 batteries x 3",
              "scenes": {}}

    arms = {}
    chunk = 1101
    for sname, (scene, cam, cfg) in scenes.items():
        for count_iters in (False, True):
            chunk += 1
            mk.COUNT_ITERS = count_iters
            r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
            sync(r.render(scene, cam, seed=0))
            arms[(sname, count_iters)] = (r, scene, cam, [], [])
            print(json.dumps({"warm": sname, "iters": count_iters}),
                  flush=True)

    seed = 1
    for battery in range(3):
        for (sname, count_iters), (r, scene, cam, times, segs) in arms.items():
            mk.COUNT_ITERS = count_iters
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                segs.append(float(np.asarray(f.rays_traced)))
                seed += 1
        print(json.dumps({"battery": battery}), flush=True)
    mk.COUNT_ITERS = False

    for sname, (scene, cam, cfg) in scenes.items():
        rn, _, _, t_n, s_n = arms[(sname, False)]
        ri, _, _, t_i, s_i = arms[(sname, True)]
        pscene = rn.prepare(scene)
        sl, _, _ = rn.shortlists(pscene, cam)
        split = sl is not None
        nbx = -(-cfg.width // mk.BLOCK_W)
        nby = -(-cfg.height // mk.BLOCK_H)
        n_tiles = nbx * nby
        lane_iters = statistics.mean(s_i)
        tile_iters = lane_iters / mk.TILE
        p50 = statistics.median(t_n) * 1e3
        p50_i = statistics.median(t_i) * 1e3
        segs_live = statistics.mean(s_n)
        a_iters = n_tiles * cfg.samples_per_pixel if split else 0
        b_iters = tile_iters - a_iters
        entry = {
            "split": split, "n_tiles": n_tiles,
            "p50_ms_normal": round(p50, 1),
            "p50_ms_iters_arm": round(p50_i, 1),
            "segments_live": round(segs_live),
            "lane_iterations": round(lane_iters),
            "tile_iterations": round(tile_iters, 1),
            "occupancy": round(segs_live / lane_iters, 4),
            "phaseA_tile_iters": a_iters,
            "phaseB_tile_iters": round(b_iters, 1),
            "us_per_tile_iter_whole_frame": round(p50 * 1e3 / tile_iters, 3),
            "us_per_phaseB_iter_excl_A": None,
        }
        if split and sname == "headline":
            # PHASEA_r04.json: phase A = 45.1 ms at this exact config.
            entry["us_per_phaseB_iter_excl_A"] = round(
                (p50 - 45.1) * 1e3 / b_iters, 3)
        report["scenes"][sname] = entry
        print(json.dumps({sname: entry}), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
