"""TPU A/B: REMASK_SCHEDULE re-tune under kd grouping.

The shipped K=5 unroll depth was tuned under morton grouping (exp_round3c/d/e,
straggler ~10.8 groups); kd grouping cut the replayed straggler to ~8.4, so
the optimum may have shifted down. Paired same-session batteries (tunnel
drift is ±3%, the size of the expected effect): all arms compile first, then
alternate within each battery. Headline scene, kd (default) grouping, K in
{3, 4, 5, 6}; dense scene K in {5, 8} (its straggler is longer: 14.6).

    python scripts/exp_remask_kd.py          # real TPU, ~20-30 min
"""

import dataclasses
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
    from bevyray_tpu.kernels.pallas import megakernel as mk

    def sync(f):
        return np.asarray(f.image[0, 0])

    head_w = rtiow.final_scene(seed=42)
    head_scene = head_w.extract(with_bvh=False)
    head_cam = head_w.camera_state(aspect=1920 / 1080)
    dense_w = make_world()
    dense_scene = dense_w.extract(with_bvh=False)
    dense_cam = dense_w.camera_state(aspect=640 / 384)

    arms = {}
    uniq = 970

    def build(tag, scene, cam, w, h, spp, k):
        nonlocal uniq
        uniq += 1
        cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                           bounces=4, level=3, sphere_chunk=uniq)
        old = mk.REMASK_SCHEDULE
        mk.REMASK_SCHEDULE = (k,)
        try:
            r = PallasRenderer(cfg)
            sync(r.render(scene, cam, seed=0))     # compile + warm
        finally:
            mk.REMASK_SCHEDULE = old
        arms[(tag, k)] = (r, scene, cam, [], [])

    for k in (3, 4, 5, 6):
        build("headline", head_scene, head_cam, 1920, 1080, 16, k)
    for k in (5, 8):
        build("dense", dense_scene, dense_cam, 640, 384, 4, k)

    # NOTE: REMASK_SCHEDULE is read at trace time only; the compiled steps
    # cached per-renderer above keep their arm's schedule baked in.
    seed = 1
    for battery in range(3):
        for key, (r, scene, cam, times, rays) in arms.items():
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1

    for (tag, k), (_, _, _, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        print(json.dumps({
            "probe": f"remask_kd_{tag}", "k": k,
            "p50_ms": round(p50 * 1e3, 1),
            "mrays": round(np.mean(rays) / p50 / 1e6, 1),
            "n_frames": len(times),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
