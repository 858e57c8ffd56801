"""Round-3h TPU probes: phase-A cost decomposition + sample-loop unroll.

Phase A measures 44-50 ms/frame (5.4-6.2 us/tile-sample, exp_round3g) but its
composition was never directly measured — the estimated vector-issue cost is
only ~0.5 us, so most of the budget is unattributed (VMEM state parking,
compaction, RNG, scatter, loop carry). This battery ablates one component per
run at bounces=0 (phase A alone under the split; the ablations are
timing-only and produce wrong images — see megakernel._DEBUG_PHASEA).

PHASEA_UNROLL is the shippable candidate: python-unroll the 16-sample
fori_loop exactly like the walk-prefix unroll (exp_round3f mechanism —
register-resident accumulator carry, no per-sample loop bookkeeping).
Verified bit-identical in interpret mode before this battery ran.
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

    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1920 / 1080)
    head = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                        bounces=4, level=3)
    b0 = dataclasses.replace(head, bounces=0)

    uniq = [3000]

    def run(name, cfg, ablate=(), unroll=False, n=6):
        uniq[0] += 1
        cfg = dataclasses.replace(cfg, sphere_chunk=uniq[0])
        old_ab, old_un = mk._DEBUG_PHASEA, mk.PHASEA_UNROLL
        mk._DEBUG_PHASEA = frozenset(ablate)
        mk.PHASEA_UNROLL = unroll
        try:
            r = PallasRenderer(cfg)
            p50, rays = timeit(lambda s: r.render(scene, cam, seed=s), n=n)
        finally:
            mk._DEBUG_PHASEA, mk.PHASEA_UNROLL = old_ab, old_un
        print(json.dumps({"probe": name, "p50_ms": round(p50 * 1e3, 2),
                          "mrays": round(rays / p50 / 1e6, 1),
                          "rays_m": round(rays / 1e6, 2)}), flush=True)

    sets = sys.argv[1:] or ["decomp", "unroll"]
    if "decomp" in sets:
        # Decomposition at bounces=0 (phase A alone; ablations timing-only).
        run("b0_base", b0)
        run("b0_no_compact", b0, ("no_compact",))
        run("b0_no_st_no_compact", b0, ("no_st", "no_compact"))
        run("b0_no_scatter", b0, ("no_scatter",))
        run("b0_no_jitter", b0, ("no_jitter",))
        run("b0_no_intersect", b0, ("no_intersect",))
        run("b0_no_harvest", b0, ("no_harvest",))
    if "recheck" in sets:
        # Re-confirm the two anomalous SLOWER-when-removed results, plus the
        # all-ablations floor (raygen + RNG + loop machinery only).
        run("b0_base2", b0)
        run("b0_no_scatter2", b0, ("no_scatter",))
        run("b0_no_jitter2", b0, ("no_jitter",))
        run("b0_floor", b0, ("no_compact", "no_st", "no_scatter", "no_jitter",
                             "no_intersect", "no_harvest"))
    if "unroll" in sets:
        # The shippable candidate, first at b0 then at the headline (paired).
        run("b0_unroll", b0, unroll=True)
        run("head_base", head)
        run("head_unroll", head, unroll=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
