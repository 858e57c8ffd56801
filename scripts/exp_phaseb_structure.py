"""Phase-B structure measurement for the speed-of-light analysis (CPU).

Replays the wavefront bounce loop at the headline camera/scene and, for every
bounce>=1 segment (the megakernel's phase-B "bounce soup"), computes the
per-lane CANDIDATE-GROUP count against the actual candidate AABB tables the
kernel uses (gc = 16 / 32 / 96...), plus the segment mix (which material kind
spawned it). From the per-segment candidate distribution it also estimates the
tile-lockstep STRAGGLER (expected max over 4096 lanes drawn from the mix),
which bounds the kernel's per-iteration walk steps.

Output: one JSON line per gc + one for the segment mix. These numbers feed
docs/SPEED_OF_LIGHT.md; they are geometry statistics, so CPU-exact.

    python scripts/exp_phaseb_structure.py          # ~2-4 min on CPU
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.core import rng as rngmod
    from bevyray_tpu.engine import slots
    from bevyray_tpu.kernels.intersect import (gather_materials,
                                               intersect_spheres,
                                               make_hit_info)
    from bevyray_tpu.kernels.pallas.megakernel import (GROUP, SUPER,
                                                       prepare_pallas_scene)
    from bevyray_tpu.kernels.raygen import generate_rays, pixel_uv
    from bevyray_tpu.kernels.shade import scatter

    W, H, SPP, BOUNCES = 960, 540, 2, 4   # quarter-res headline: same camera,
    world = rtiow.final_scene(seed=42)    # same scene -> same soup geometry
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=W / H)
    config = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                          bounces=BOUNCES, level=3)

    # ---- replay the bounce loop, recording each bounce>=1 segment ----------
    u, v = pixel_uv(W, H)
    pixel_ids = jnp.arange(W * H, dtype=jnp.uint32)
    seg_o, seg_d, seg_kind = [], [], []

    @jax.jit
    def one_bounce(o, d, alive, stream, bounce):
        t, idx = intersect_spheres(o, d, scene.spheres, config.sphere_chunk)
        hit = make_hit_info(o, d, t, idx, scene.spheres)
        mat = gather_materials(scene.materials, hit.material_id)
        base = jnp.uint32(slots.RAYGEN_DRAWS) + (
            jnp.uint32(bounce) * np.uint32(slots.DRAWS_PER_BOUNCE))
        u_metal = rngmod.draw(stream, base + np.uint32(slots.S_METAL))
        u_trans = rngmod.draw(stream, base + np.uint32(slots.S_TRANS))
        u_reflect = rngmod.draw(stream, base + np.uint32(slots.S_REFLECT))
        b1 = [rngmod.draw(stream, base + np.uint32(slots.S_BALL1 + k))
              for k in range(5)]
        b2 = [rngmod.draw(stream, base + np.uint32(slots.S_BALL2 + k))
              for k in range(5)]
        ball1 = rngmod.unit_ball_from_uniforms(*b1)
        ball2 = rngmod.unit_ball_from_uniforms(*b2)
        sc = scatter(d, hit, mat, u_metal, u_trans, u_reflect, ball1, ball2)
        cont = alive & ~hit.miss & ~sc.absorbed
        # Segment kind: 0 diffuse, 1 metal, 2 dielectric (the branch taken).
        kind = jnp.where(u_metal < mat.metallic, 1,
                         jnp.where(u_trans < mat.specular_transmission, 2, 0))
        return hit.position, sc.direction, cont, kind

    for s in range(SPP):
        stream = rngmod.stream_init(pixel_ids, jnp.uint32(s), jnp.uint32(1))
        ju = rngmod.draw(stream, np.uint32(slots.JITTER_U))
        jv = rngmod.draw(stream, np.uint32(slots.JITTER_V))
        o, d = generate_rays(u, v, ju, jv, cam, H)
        alive = jnp.ones(W * H, bool)
        for b in range(BOUNCES):
            pos, nd, cont, kind = one_bounce(o, d, alive, stream, b)
            cont = np.asarray(cont)
            if not cont.any():
                break
            ox = np.stack([np.asarray(x)[cont] for x in
                           (pos.x, pos.y, pos.z)], 1)
            dx = np.stack([np.asarray(x)[cont] for x in (nd.x, nd.y, nd.z)], 1)
            seg_o.append(ox)
            seg_d.append(dx)
            seg_kind.append(np.asarray(kind)[cont])
            o = type(o)(pos.x, pos.y, pos.z)
            d = type(d)(nd.x, nd.y, nd.z)
            alive = jnp.asarray(cont)

    O = np.concatenate(seg_o)      # phase-B segment origins
    D = np.concatenate(seg_d)
    K = np.concatenate(seg_kind)
    n_seg = O.shape[0]
    mix = {"segments": int(n_seg),
           "frac_diffuse": round(float((K == 0).mean()), 4),
           "frac_metal": round(float((K == 1).mean()), 4),
           "frac_dielectric": round(float((K == 2).mean()), 4)}
    print(json.dumps({"probe": "segment_mix", **mix}), flush=True)

    # ---- candidate-group counts per segment vs the kernel's actual AABBs ---
    def cand_stats(cand_size):
        ps = jax.jit(lambda sc_: prepare_pallas_scene(sc_, cand_size))(scene)
        gaabb = np.asarray(ps.gaabb)
        s_pad = ps.sph.shape[1]
        gc = ps.grp.shape[0] // 4
        n32 = s_pad // GROUP
        n_cand = -(-s_pad // gc)
        if gc == GROUP:
            off = 0
        else:
            n_super = -(-n32 // SUPER) if n32 >= 4 * SUPER else 0
            off = n32 + n_super
        box = gaabb[:, off:off + n_cand]                    # (6, n_cand)
        inv = 1.0 / D                                       # (N, 3), inf ok
        t1 = (box[None, 0:3, :] - O[:, :, None]) * inv[:, :, None]
        t2 = (box[None, 3:6, :] - O[:, :, None]) * inv[:, :, None]
        t_near = np.minimum(t1, t2).max(axis=1)             # (N, n_cand)
        t_far = np.maximum(t1, t2).min(axis=1)
        useful = (t_far >= t_near) & (t_far > 0.0)
        counts = useful.sum(axis=1)                         # groups per segment
        # Expected tile straggler: max over 4096 draws from the empirical mix.
        rs = np.random.default_rng(0)
        straggler = [counts[rs.integers(0, n_seg, 4096)].max()
                     for _ in range(64)]
        return {"probe": f"cand_groups_gc{gc}", "gc": int(gc),
                "n_cand": int(n_cand),
                "mean": round(float(counts.mean()), 2),
                "p50": int(np.percentile(counts, 50)),
                "p95": int(np.percentile(counts, 95)),
                "max": int(counts.max()),
                "mean_spheres_tested": round(float(counts.mean()) * gc, 1),
                "expected_tile_straggler": round(float(np.mean(straggler)), 1)}

    for cs in (16, 32):
        print(json.dumps(cand_stats(cs)), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
