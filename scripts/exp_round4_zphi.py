"""Round-4 TPU probe: z/phi ball draws (HW_DRAWS_ZPHI) vs the shipped 9-row
compact layout.

VERDICT r3 item 2 (t_fix): per-row generation dominates the hw provider, so
the scatter budget drops 9 -> 6 rows/bounce by sampling ball DIRECTIONS via
Archimedes z/phi (2 full rows/ball instead of 4) — also exactly uniform and
transcendental-cheaper than the fast-math Box-Muller route (megakernel.
_fast_ball_zphi). Distribution pinned off-hw by tests/test_rng.py::
test_fast_ball_zphi_statistics; this battery decides the perf ship and also
sanity-checks the distribution ON hardware (mosaic fast-math) against the XLA
renderer's exact-RNG estimate.

Paired same-session interleaved A/B (tunnel drift is +-3%):

    python scripts/exp_round4_zphi.py     # real TPU, ~15 min
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT = "ZPHI_AB_r04.json"


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.engine.renderer import Renderer
    from bevyray_tpu.kernels.pallas import megakernel as mk

    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1920 / 1080)
    head = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                        bounces=4, level=3)

    def sync(f):
        return np.asarray(f.image[0, 0])

    # --- on-hardware distribution sanity (cheap, before the timing arms) ----
    mworld = rtiow.material_test_scene()
    mscene = mworld.extract(with_bvh=False)
    mcam = mworld.camera_state(aspect=1.0)
    mcfg = RenderConfig(width=16, height=16, samples_per_pixel=32, bounces=5,
                        level=3)
    want = np.asarray(Renderer(mcfg).render(mscene, mcam, seed=5).image)
    mk.HW_DRAWS_ZPHI = True
    got = np.asarray(PallasRenderer(
        dataclasses.replace(mcfg, sphere_chunk=973),
        exact_rng=False).render(mscene, mcam, seed=5).image)
    stat = {"mean_abs": float(np.abs(got - want).mean()),
            "mean_shift": float(abs(got.mean() - want.mean())),
            "finite": bool(np.isfinite(got).all())}
    print(json.dumps({"zphi_hw_stat": stat}), flush=True)
    assert stat["finite"] and stat["mean_abs"] < 0.02 and stat["mean_shift"] < 0.01, stat

    arms = {}
    for name, zphi, chunk in (("rows9", False, 974), ("zphi6", True, 975)):
        mk.HW_DRAWS_ZPHI = zphi
        r = PallasRenderer(dataclasses.replace(head, sphere_chunk=chunk))
        sync(r.render(scene, cam, seed=0))
        arms[name] = (r, zphi, [], [])
        print(json.dumps({"warm": name}), flush=True)

    seed = 1
    for battery in range(3):
        for name, (r, zphi, times, rays) in arms.items():
            mk.HW_DRAWS_ZPHI = zphi
            for _ in range(3):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1
        print(json.dumps({"battery": battery}), flush=True)

    report = {"probe_script": "scripts/exp_round4_zphi.py",
              "date": "2026-08-19",
              "protocol": "paired same-session interleaved, 3 batteries x 3 frames",
              "zphi_hw_stat": stat, "arms": []}
    for name, (r, zphi, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50)) * 1e3
        mrays = float(np.median(rays) / np.percentile(times, 50) / 1e6)
        report["arms"].append({"probe": name, "p50_ms": round(p50, 1),
                               "mrays": round(mrays, 1), "n_frames": len(times)})
        print(json.dumps(report["arms"][-1]), flush=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
