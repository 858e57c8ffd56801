"""TPU experiment: phase-split + fast-disc megakernel variants at the headline
config (1080p/16spp/4 bounces, RTiOW final scene). Prints one JSON line per
variant. Run on a real TPU box; ~1 Pallas compile per variant."""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer

    W, H, SPP, B = 1920, 1080, 16, 4
    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=W / H)

    def sync(frame):
        return np.asarray(frame.image[0, 0])

    variants = [
        ("off+slow", dict(pallas_primary="off", pallas_fast_disc=False)),
        ("off+fast", dict(pallas_primary="off", pallas_fast_disc=True)),
        ("split+slow", dict(pallas_primary="split", pallas_fast_disc=False)),
        ("split+fast", dict(pallas_primary="split", pallas_fast_disc=True)),
    ]
    results = {}
    imgs = {}
    for name, kw in variants:
        cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                           bounces=B, level=3, **kw)
        r = PallasRenderer(cfg)
        t0 = time.perf_counter()
        f = r.render(scene, cam, seed=0)
        sync(f)
        compile_s = time.perf_counter() - t0
        times, rays = [], []
        for i in range(6):
            t0 = time.perf_counter()
            f = r.render(scene, cam, seed=i + 1)
            sync(f)
            times.append(time.perf_counter() - t0)
            rays.append(float(f.rays_traced))
        p50 = float(np.percentile(times, 50))
        mrays = float(np.mean(rays)) / p50 / 1e6
        imgs[name] = np.asarray(r.render(scene, cam, seed=99).image)
        results[name] = dict(p50_ms=round(p50 * 1e3, 2),
                             mrays=round(mrays, 1),
                             compile_s=round(compile_s, 1))
        print(json.dumps({name: results[name]}), flush=True)

    # fast-disc must be bit-identical per loop shape (same RNG draw order).
    for base in ("off", "split"):
        d = float(np.max(np.abs(imgs[f"{base}+slow"] - imgs[f"{base}+fast"])))
        print(json.dumps({f"{base} fast-vs-slow max|d|": d}), flush=True)
    # split vs off on hw RNG differs statistically; report mean |d| only.
    print(json.dumps({"split-vs-off mean|d|": float(
        np.mean(np.abs(imgs["split+fast"] - imgs["off+fast"])))}), flush=True)


if __name__ == "__main__":
    main()
