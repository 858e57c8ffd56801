"""TPU probe: where does the phase-split frame time go?

  a) bounces=0, split vs off   — isolates the coherent bounce-0 pass cost
  b) full frame, one-hot fetch vs bogus static fetch — isolates the phase-B
     stored-state restart cost (static variant renders WRONG images; timing
     only)

Eager render_tiles calls (identical overhead across variants)."""

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

    W, H, SPP, B = 1920, 1080, 16, 4
    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=W / H)

    def time_eager(cfg, use_sl, label):
        r = PallasRenderer(cfg)
        pscene = r.prepare(scene)
        sl, slmeta, _ = (r.shortlists(pscene, cam) if use_sl
                         else (None, None, None))

        @jax.jit
        def jf(pscene, cam, seed, sl, slmeta):
            return mk.render_tiles(pscene, cam, cfg, seed,
                                   sl=sl, slmeta=slmeta)

        def frame(seed):
            out = jf(pscene, cam, np.uint32(seed), sl, slmeta)
            return np.asarray(out[0][:1])   # sync

        frame(0)
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            frame(i + 1)
            times.append(time.perf_counter() - t0)
        p50 = float(np.percentile(times, 50))
        print(json.dumps({label: round(p50 * 1e3, 2)}), flush=True)
        return p50

    base = dict(width=W, height=H, samples_per_pixel=SPP, level=3)
    # (a) bounce-0-only frames
    time_eager(RenderConfig(**base, bounces=0, pallas_primary="off"),
               False, "b0 off p50_ms")
    time_eager(RenderConfig(**base, bounces=0, pallas_primary="split"),
               True, "b0 split p50_ms")
    # (b) full frames, fetch ablation
    time_eager(RenderConfig(**base, bounces=B, pallas_primary="split"),
               True, "full split p50_ms")
    mk._DEBUG_STATIC_FETCH = True
    time_eager(RenderConfig(**base, bounces=B, pallas_primary="split"),
               True, "full split STATIC-FETCH p50_ms")
    mk._DEBUG_STATIC_FETCH = False


if __name__ == "__main__":
    main()
