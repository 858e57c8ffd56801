"""TPU A/B: phase-A shortlist walk-all (no chunked early-out) vs chunked,
full frame at the headline config."""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


def main():
    import bevyray_tpu.kernels.pallas.megakernel as mk
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer

    W, H = 1920, 1080
    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=W / H)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=16, bounces=4,
                       level=3)
    r = PallasRenderer(cfg)
    pscene = r.prepare(scene)
    sl, slmeta, _ = r.shortlists(pscene, cam)

    for walk_all in (32, 0):
        mk.SL_WALK_ALL_MAX = walk_all

        @jax.jit
        def jf(pscene, cam, seed, sl, slmeta):
            return mk.render_tiles(pscene, cam, cfg, seed, sl=sl,
                                   slmeta=slmeta)

        def frame(seed):
            return np.asarray(jf(pscene, cam, np.uint32(seed), sl,
                                 slmeta)[0][:1])

        frame(0)
        times = []
        for i in range(6):
            t0 = time.perf_counter()
            frame(i + 1)
            times.append(time.perf_counter() - t0)
        print(json.dumps({f"walk_all={walk_all} p50_ms":
                          round(float(np.percentile(times, 50)) * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
