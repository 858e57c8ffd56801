"""TPU battery: grouping-quality knobs opened by the multi-word masks + SAH.

One paired same-session battery (tunnel drift is ±3%, the size of these
effects) covering the whole decision matrix in 5 Pallas compiles (one per
distinct cand_size×scene shape — rules share a compiled program):

  headline (1080p/16spp, 508 spheres):
    gc=16 × {median, sah}   — SAH replay: mean entered 2.53→2.11, strag 8.4→7.8
    gc=8  × {median, sah}   — replay: strag spheres 125→84 (−33% walk bytes)
                              at +2.7 straggler steps (3-word masks, chunk 8)
  dense (640×384/4spp, 5,000 spheres), rules tied in replay — median only:
    gc=96 (shipped auto)  vs  gc=48 (4-word masks; replay −27% straggler
    bytes at +6.7 steps)  vs  gc=32 (6-word; −42% bytes at +11 steps)

Arms sharing a compiled program (same gc, different rule) differ only in the
host-side permutation fed through jit; each arm's renderer caches its own
prepared scene from the warm call made under its rule.

    python scripts/exp_group_ab.py          # real TPU, ~20-30 min
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def main():
    from exp_large_scene import make_world
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import grouping

    def sync(f):
        return np.asarray(f.image[0, 0])

    head_w = rtiow.final_scene(seed=42)
    head_scene = head_w.extract(with_bvh=False)
    head_cam = head_w.camera_state(aspect=1920 / 1080)
    dense_w = make_world()
    dense_scene = dense_w.extract(with_bvh=False)
    dense_cam = dense_w.camera_state(aspect=640 / 384)

    plan = [("headline", 16, "median"), ("headline", 16, "sah"),
            ("headline", 8, "median"), ("headline", 8, "sah"),
            ("dense", 96, "median"), ("dense", 48, "median"),
            ("dense", 32, "median")]

    arms = {}
    for tag, gc, rule in plan:
        scene, cam, (w, h, spp) = (
            (head_scene, head_cam, (1920, 1080, 16)) if tag == "headline"
            else (dense_scene, dense_cam, (640, 384, 4)))
        cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                           bounces=4, level=3, pallas_cand_size=gc)
        r = PallasRenderer(cfg)
        grouping.KD_RULE = rule
        sync(r.render(scene, cam, seed=0))     # compile + warm
        arms[(tag, gc, rule)] = (r, scene, cam, [], [])
        print(json.dumps({"warm": f"{tag}_gc{gc}_{rule}"}), flush=True)

    seed = 1
    for battery in range(3):
        for (tag, gc, rule), (r, scene, cam, times, rays) in arms.items():
            grouping.KD_RULE = rule
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1

    grouping.KD_RULE = "median"
    for (tag, gc, rule), (_, _, _, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        print(json.dumps({
            "probe": f"group_ab_{tag}", "gc": gc, "rule": rule,
            "p50_ms": round(p50 * 1e3, 1),
            "mrays": round(np.mean(rays) / p50 / 1e6, 1),
            "n_frames": len(times),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
