"""Round-3c TPU probes: cheap pre-brute (no popularity machinery) + mid-walk
re-mask, after exp_round3b measured the popularity-counting version negative.

  brute0 / brute0x2 — unconditionally brute the 1-2 leading (quarantine)
      groups and clear their bits: zero reductions, zero conds.
  remaskK — K unrolled walk steps, one hoisted re-mask, while for the rest —
      aimed at the pair-bound dense scene.
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(render, n=6):
    f = render(0)
    np.asarray(f.image[0, 0])
    ts, rays = [], []
    for i in range(n):
        t0 = time.perf_counter()
        f = render(i + 1)
        np.asarray(f.image[0, 0])
        ts.append(time.perf_counter() - t0)
        rays.append(float(f.rays_traced))
    return float(np.percentile(ts, 50)), float(np.mean(rays))


def main():
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import megakernel as mk
    from exp_large_scene import make_world

    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1920 / 1080)
    head = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                        bounces=4, level=3, pallas_cand_size=16)

    uniq = [700]

    def run(name, cfg, flags, sc_, cm, n=6):
        uniq[0] += 1
        cfg = dataclasses.replace(cfg, sphere_chunk=uniq[0])
        saved = {k: getattr(mk, k) for k in flags}
        for k, v in flags.items():
            setattr(mk, k, v)
        try:
            r = PallasRenderer(cfg)
            p50, rays = timeit(lambda s: r.render(sc_, cm, seed=s), n=n)
        finally:
            for k, v in saved.items():
                setattr(mk, k, v)
        print(json.dumps({"probe": name, "p50_ms": round(p50 * 1e3, 2),
                          "mrays": round(rays / p50 / 1e6, 1)}), flush=True)

    run("head_c16_ref", head, {}, scene, cam)
    run("head_c16_brute0", head, {"BRUTE_FIRST_GROUPS": 1}, scene, cam)
    run("head_c16_brute0x2", head, {"BRUTE_FIRST_GROUPS": 2}, scene, cam)
    # NOTE: when this battery was recorded the re-mask knob was a single int
    # (REMASK_AT=k); it later became the tuple REMASK_SCHEDULE=(k,) — same
    # semantics at one schedule point, so re-runs measure what the labels say.
    run("head_c16_remask2", head, {"REMASK_SCHEDULE": (2,)}, scene, cam)
    run("head_c16_b0_rm2", head,
        {"BRUTE_FIRST_GROUPS": 1, "REMASK_SCHEDULE": (2,)}, scene, cam)

    big = make_world()
    bscene = big.extract(with_bvh=False)
    bcam = big.camera_state(aspect=640 / 384)
    bcfg = RenderConfig(width=640, height=384, samples_per_pixel=4, bounces=4,
                        level=3)
    run("big96_remask2", bcfg, {"REMASK_SCHEDULE": (2,)}, bscene, bcam, n=5)
    run("big96_remask4", bcfg, {"REMASK_SCHEDULE": (4,)}, bscene, bcam, n=5)
    run("big96_brute0", bcfg, {"BRUTE_FIRST_GROUPS": 1}, bscene, bcam, n=5)
    run("big96_b0_rm2", bcfg,
        {"BRUTE_FIRST_GROUPS": 1, "REMASK_SCHEDULE": (2,)}, bscene, bcam, n=5)
    run("big192_remask2",
        dataclasses.replace(bcfg, pallas_cand_size=192),
        {"REMASK_SCHEDULE": (2,)}, bscene, bcam, n=5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
