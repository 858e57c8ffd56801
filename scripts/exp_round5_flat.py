"""Round-5 TPU battery: FLATTENED phase-B walk (PHASEB_FLAT) vs the shipped
nested scheduling — the dense-scene program-family change (VERDICT r4 item 2).

Dense rationale: the nested walk's while loop is bounded by the tile's walk
STRAGGLER (kd replay: 14.6 entered groups) while the MEAN is 3.10 — lanes
idle ~4/5 of walk time. The flat loop runs FLAT_WALK_STEPS candidate steps
per outer iteration and finished lanes immediately scatter/restart, so
per-segment walk cost tracks the mean; the price is the segment-fixed
machinery (fetch/gather/draws/scatter/harvest + a mask build) per ITERATION.
Cheap at dense (15-slot fetch at 4 spp·fuse 4), expensive at the headline
(63-slot fetch) — the headline arm is expected to LOSE and pins the gate.

Paired same-session interleaved battery (exp_round4_dense pattern: unique
sphere_chunk per arm so each gets its own jit entry; knobs set before every
call because they bake at trace time only):

    python scripts/exp_round5_flat.py          # real TPU, ~6 compiles
    python scripts/exp_round5_flat.py dense    # dense arms only (4 compiles)

Correctness anchor is tests/test_flat_walk.py (CPU interpret, bit-identical
exact-RNG images + segment counts); on hardware the hw-PRNG draw sequences
differ between programs by construction, so only throughput is compared.
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def sync(f):
    return np.asarray(f.image[0, 0])


def run_battery(name, base, scene, cam, plan, n_batteries=3, n_frames=3,
                share_chunk=False):
    """``share_chunk``: all arms reuse ONE sphere_chunk (and thus one
    compiled program) — only valid when the arms differ purely in DATA
    (e.g. the kd permutation argument), not in any trace-baked knob."""
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.kernels.pallas import grouping
    from bevyray_tpu.kernels.pallas import megakernel as mk

    arms = {}
    chunk = base.sphere_chunk or 1080
    fuse0, j0, rule0 = mk.PHASE_FUSE, mk.PHASEB_UNROLL, grouping.KD_RULE
    for arm, spec in plan:
        flat, steps = spec[0], spec[1]
        remask = spec[2] if len(spec) > 2 else False
        fuse = spec[3] if len(spec) > 3 else fuse0
        j = spec[4] if len(spec) > 4 else j0
        cand = spec[5] if len(spec) > 5 else base.pallas_cand_size
        rule = spec[6] if len(spec) > 6 else rule0
        if not share_chunk:
            chunk += 1
        mk.PHASEB_FLAT = flat
        mk.FLAT_WALK_STEPS = steps
        mk.FLAT_REMASK = remask
        mk.PHASE_FUSE = fuse
        mk.PHASEB_UNROLL = j
        grouping.KD_RULE = rule     # read at prepare time (the warm render);
        # timed frames hit the per-renderer pscene cache, so each arm keeps
        # its own ordering without further sets.
        r = PallasRenderer(dataclasses.replace(base, sphere_chunk=chunk,
                                               pallas_cand_size=cand))
        t0 = time.perf_counter()
        sync(r.render(scene, cam, seed=0))
        arms[arm] = (r, (flat, steps, remask, fuse, j), [], [])
        print(json.dumps({"warm": f"{name}/{arm}",
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    seed = 1
    for battery in range(n_batteries):
        for arm, (r, knobs, times, rays) in arms.items():
            (mk.PHASEB_FLAT, mk.FLAT_WALK_STEPS,
             mk.FLAT_REMASK, mk.PHASE_FUSE, mk.PHASEB_UNROLL) = knobs
            for _ in range(n_frames):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=seed)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
                seed += 1
        print(json.dumps({"battery": battery}), flush=True)
    mk.PHASE_FUSE, mk.PHASEB_UNROLL = fuse0, j0
    grouping.KD_RULE = rule0

    rows = []
    for arm, (r, knobs, times, rays) in arms.items():
        p50 = float(np.percentile(times, 50))
        rows.append({"scene": name, "arm": arm, "p50_ms": round(p50 * 1e3, 2),
                     "mrays": round(np.mean(rays) / p50 / 1e6, 2),
                     "n_frames": len(times)})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from exp_large_scene import make_world
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.kernels.pallas import megakernel as _mk

    def mk_f():
        return _mk.PHASE_FUSE

    def mk_j():
        return _mk.PHASEB_UNROLL

    out = {"probe": "exp_round5_flat", "rows": []}

    if which in ("all", "dense"):
        world = make_world()
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=640 / 384)
        base = RenderConfig(width=640, height=384, samples_per_pixel=4,
                            bounces=4, level=3)
        plan = [("ship", (False, 1)), ("flat1", (True, 1)),
                ("flat2", (True, 2)), ("flat3", (True, 3))]
        out["rows"] += run_battery("dense", base, scene, cam, plan)

    if which == "ladder2":
        world = make_world()
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=640 / 384)
        base = RenderConfig(width=640, height=384, samples_per_pixel=4,
                            bounces=4, level=3, sphere_chunk=1120)
        plan = [("flat3", (True, 3)), ("flat4", (True, 4)),
                ("flat6", (True, 6)), ("flat2r", (True, 2, True)),
                ("flat3r", (True, 3, True))]
        out["rows"] += run_battery("dense", base, scene, cam, plan)

    if which in ("all", "headline"):
        # The gate docstring PREDICTS flat loses here (63-slot fetch per
        # iteration); the dense ladder says steps 2-4 is where flat wins if
        # it can. ship + the two best dense arms settles the gate with data.
        world = rtiow.final_scene(seed=42)
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=16 / 9)
        base = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                            bounces=4, level=3)
        plan = [("ship", (False, 1)), ("flat2", (True, 2)),
                ("flat4", (True, 4))]
        out["rows"] += run_battery("headline", base, scene, cam, plan,
                                   n_frames=2)

    if which == "retune":
        # The shipped J=2 (PHASEB_UNROLL) was tuned under the NESTED body
        # (round-4 session-6); the flat body is a different program — J now
        # multiplies whole flat iterations (J x steps candidate steps between
        # while-cond evaluations). Re-ladder J and the steps neighborhood at
        # the headline under flat defaults.
        world = rtiow.final_scene(seed=42)
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=16 / 9)
        base = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                            bounces=4, level=3, sphere_chunk=1160)
        from bevyray_tpu.kernels.pallas import megakernel as mk
        fuse0 = mk.PHASE_FUSE
        plan = [("f4_j2", (True, 4)),
                ("f4_j1", (True, 4, False, fuse0, 1)),
                ("f4_j3", (True, 4, False, fuse0, 3)),
                ("f3_j2", (True, 3)), ("f5_j2", (True, 5)),
                ("f4r_j2", (True, 4, True))]
        out["rows"] += run_battery("headline", base, scene, cam, plan,
                                   n_frames=2)

    if which == "jconfirm":
        # Confirm the retune battery's J=3 edge (+1.6% over shipped J=2)
        # with a dedicated paired battery incl. J=4, plus the dense scene
        # (J was scene-dependent under nested; re-check under flat).
        world = rtiow.final_scene(seed=42)
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=16 / 9)
        base = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                            bounces=4, level=3, sphere_chunk=1220)
        fuse0 = mk_f()
        plan = [("j2", (True, 4)), ("j3", (True, 4, False, fuse0, 3)),
                ("j4", (True, 4, False, fuse0, 4))]
        out["rows"] += run_battery("headline", base, scene, cam, plan,
                                   n_frames=2)
        world = make_world()
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=640 / 384)
        base = RenderConfig(width=640, height=384, samples_per_pixel=4,
                            bounces=4, level=3, sphere_chunk=1240)
        plan = [("j2", (True, 4)), ("j3", (True, 4, False, fuse0, 3))]
        out["rows"] += run_battery("dense", base, scene, cam, plan)

    if which == "j4confirm":
        # jconfirm battery: j2 574.7 / j3 574.2 (tie) / j4 586.1 (+2.0%).
        # One focused j2-vs-j4 pair decides the headline unroll.
        world = rtiow.final_scene(seed=42)
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=16 / 9)
        base = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                            bounces=4, level=3, sphere_chunk=1260)
        plan = [("j2", (True, 4)), ("j4", (True, 4, False, mk_f(), 4))]
        out["rows"] += run_battery("headline", base, scene, cam, plan,
                                   n_frames=3)

    if which == "sahflat":
        # KD_RULE="sah" RE-POSED under the flat walk. Round-4 hardware
        # rejected it (−14% headline under NESTED) despite replay showing
        # mean entered 2.53→2.11 (−17%): the nested walk bills the tile
        # STRAGGLER, and sah's count-weighted cuts trade straggler for mean.
        # The flat walk bills the MEAN — exactly what sah improves. Orders
        # are permutation ARGUMENTS (no recompile; arms share kernels).
        fuse0 = mk_f()
        world = rtiow.final_scene(seed=42)
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=16 / 9)
        base = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                            bounces=4, level=3, sphere_chunk=1280)
        plan = [("median", (True, 4)),
                ("sah", (True, 4, False, fuse0, mk_j(), 0, "sah"))]
        out["rows"] += run_battery("headline", base, scene, cam, plan,
                                   n_frames=3, share_chunk=True)
        world = make_world()
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=640 / 384)
        base = RenderConfig(width=640, height=384, samples_per_pixel=4,
                            bounces=4, level=3, sphere_chunk=1290)
        plan = [("median", (True, 4)),
                ("sah", (True, 4, False, fuse0, mk_j(), 0, "sah"))]
        out["rows"] += run_battery("dense", base, scene, cam, plan,
                                   share_chunk=True)

    if which == "groups":
        # Group-size ladder RE-POSED under the flat walk. Round-4 hardware
        # rejected finer groups (gc48 −3%, gc32 −7% dense; gc8 −16..21%
        # headline) because the NESTED walk pays per-step fixed machinery
        # along the tile STRAGGLER lane, which finer groups lengthen in
        # steps. The flat walk's per-segment cost tracks the MEAN entered
        # count instead — finer groups now convert their culling-quality win
        # (replay: gc48/32 cut straggler bytes 27-42%) directly, IF the
        # extra mask words (4/6 vs 2) don't eat it in the per-iteration
        # build/select chains.
        world = make_world()
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=640 / 384)
        base = RenderConfig(width=640, height=384, samples_per_pixel=4,
                            bounces=4, level=3, sphere_chunk=1180)
        plan = [("gc96", (True, 4)),
                ("gc48", (True, 4, False, None, None, 48)),
                ("gc32", (True, 4, False, None, None, 32))]
        plan = [(a, s if len(s) < 6 else
                 (s[0], s[1], s[2], mk_f(), mk_j(), s[5])) for a, s in plan]
        out["rows"] += run_battery("dense", base, scene, cam, plan)

    if which == "groupshead":
        world = rtiow.final_scene(seed=42)
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=16 / 9)
        base = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                            bounces=4, level=3, sphere_chunk=1190)
        plan = [("gc16", (True, 4)),
                ("gc8", (True, 4, False, None, None, 8))]
        plan = [(a, s if len(s) < 6 else
                 (s[0], s[1], s[2], mk_f(), mk_j(), s[5])) for a, s in plan]
        out["rows"] += run_battery("headline", base, scene, cam, plan,
                                   n_frames=2)

    if which == "densefuse":
        # VERDICT r4 item 5 (dense low-spp occupancy), re-posed under the
        # flat walk: the plane budget admits fuse 8 at 4 spp (88 planes/
        # instance) — does doubling the pooled blocks still buy anything now
        # that finished lanes restart without waiting for the straggler?
        world = make_world()
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=640 / 384)
        base = RenderConfig(width=640, height=384, samples_per_pixel=4,
                            bounces=4, level=3, sphere_chunk=1140)
        plan = [("flat4_fuse4", (True, 4, False, 4)),
                ("flat4_fuse8", (True, 4, False, 8)),
                ("flat4_fuse2", (True, 4, False, 2))]
        out["rows"] += run_battery("dense", base, scene, cam, plan)

    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
