"""Dense-scene candidate-floor probe (CPU-exact geometry replay).

SPEED_OF_LIGHT SS6 records the dense 5,000-sphere wall: at the mask-capped
group size (gc=96 under the two-word 62-group mask) a soup segment carries
543 candidate spheres and the walk is pair-bound at 16 B/pair.  What that
section does NOT establish is the *floor* of mask-based culling: how many
candidate spheres a segment would carry at finer granularities (gc=48/32/16,
reachable with 4/8/11-word masks) and at the per-sphere-exact limit (gc=1).
If the exact floor is close to 543, multi-word masks are pointless and the
wall is final; if it is several times lower, a wider mask is the first new
dense-scene lever since round 2.

Replays the dense bench scene's bounce loop (same camera/scene as
scripts/exp_large_scene.py, reduced resolution — the statistics are
per-segment geometry, so resolution only subsamples them) and slab-tests
every bounce>=1 segment against:

  - per-sphere exact boxes (center +- r, padding inverted),
  - union group AABBs at gc in {96, 48, 32, 16} over the kernel's actual
    morton order (cross-checked against prepare_pallas_scene's gaabb at the
    shipping gc=96).

Reports per-gc candidate-group counts, candidate-SPHERE counts (count x gc —
the per-step gather-byte driver), and the iid tile-straggler estimate
E[max over 4096 lanes] that bounds the lockstep walk's step count.

    python scripts/exp_dense_floor.py     # CPU, ~5-10 min
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from exp_large_scene import make_world
    from bevyray_tpu import RenderConfig
    from bevyray_tpu.core import rng as rngmod
    from bevyray_tpu.engine import slots
    from bevyray_tpu.kernels.intersect import (gather_materials,
                                               intersect_spheres,
                                               make_hit_info)
    from bevyray_tpu.kernels.pallas.megakernel import (_morton_key,
                                                       prepare_pallas_scene,
                                                       GROUP, SUPER)
    from bevyray_tpu.kernels.raygen import generate_rays, pixel_uv
    from bevyray_tpu.kernels.shade import scatter

    W, H, SPP, BOUNCES = 320, 192, 2, 4   # quarter-res dense bench: same
    world = make_world()                  # camera & scene -> same geometry
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=W / H)
    config = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                          bounces=BOUNCES, level=3)

    # ---- replay the bounce loop, recording each bounce>=1 segment ----------
    u, v = pixel_uv(W, H)
    pixel_ids = jnp.arange(W * H, dtype=jnp.uint32)
    seg_o, seg_d = [], []

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
        return hit.position, sc.direction, cont

    for s in range(SPP):
        stream = rngmod.stream_init(pixel_ids, jnp.uint32(s), jnp.uint32(1))
        ju = rngmod.draw(stream, np.uint32(slots.JITTER_U))
        jv = rngmod.draw(stream, np.uint32(slots.JITTER_V))
        o, d = generate_rays(u, v, ju, jv, cam, H)
        alive = jnp.ones(W * H, bool)
        for b in range(BOUNCES):
            pos, nd, cont = one_bounce(o, d, alive, stream, b)
            cont = np.asarray(cont)
            if not cont.any():
                break
            seg_o.append(np.stack(
                [np.asarray(x)[cont] for x in (pos.x, pos.y, pos.z)], 1))
            seg_d.append(np.stack(
                [np.asarray(x)[cont] for x in (nd.x, nd.y, nd.z)], 1))
            o = type(o)(pos.x, pos.y, pos.z)
            d = type(d)(nd.x, nd.y, nd.z)
            alive = jnp.asarray(cont)

    O = np.concatenate(seg_o).astype(np.float32)
    D = np.concatenate(seg_d).astype(np.float32)
    n_seg = O.shape[0]
    print(json.dumps({"probe": "dense_segments", "n_seg": int(n_seg),
                      "per_primary": round(n_seg / (W * H * SPP), 3)}),
          flush=True)

    # ---- per-sphere boxes in the kernel's morton order ---------------------
    sp = scene.spheres
    order = np.asarray(jnp.argsort(
        _morton_key(sp.cx, sp.cy, sp.cz, sp.radius, sp.valid)))
    cx = np.asarray(sp.cx)[order]
    cy = np.asarray(sp.cy)[order]
    cz = np.asarray(sp.cz)[order]
    radius = np.abs(np.asarray(sp.radius)[order])
    live = np.asarray(sp.valid)[order] & (radius > 0)
    s_pad = cx.shape[0]
    mins = np.where(live, np.stack([cx, cy, cz]) - radius, np.inf)
    maxs = np.where(live, np.stack([cx, cy, cz]) + radius, -np.inf)

    def group_boxes(gc):
        n = -(-s_pad // gc)
        pad = n * gc - s_pad
        mn = np.concatenate([mins, np.full((3, pad), np.inf, np.float32)], 1)
        mx = np.concatenate([maxs, np.full((3, pad), -np.inf, np.float32)], 1)
        gmn = mn.reshape(3, n, gc).min(2)
        gmx = mx.reshape(3, n, gc).max(2)
        empty = ~np.isfinite(gmn[0])
        return (np.where(empty, 1.0, gmn).astype(np.float32),
                np.where(empty, -1.0, gmx).astype(np.float32))

    # Cross-check the replicated boxes against the kernel's actual tables at
    # the shipping dense gc (96): prepare_pallas_scene appends candidate boxes
    # after [n32 groups | n_super supergroups].
    ps = jax.jit(lambda s_: prepare_pallas_scene(s_, 96))(scene)
    gaabb = np.asarray(ps.gaabb)
    n32 = s_pad // GROUP
    n_super = -(-n32 // SUPER) if n32 >= 4 * SUPER else 0
    off = n32 + n_super
    n96 = -(-s_pad // 96)
    gmn96, gmx96 = group_boxes(96)
    np.testing.assert_allclose(gaabb[0:3, off:off + n96], gmn96, rtol=1e-6)
    np.testing.assert_allclose(gaabb[3:6, off:off + n96], gmx96, rtol=1e-6)
    print(json.dumps({"probe": "boxes_crosscheck", "ok": True,
                      "s_pad": int(s_pad), "n_cand_gc96": int(n96)}),
          flush=True)

    # ---- slab-test all granularities in one pass per segment chunk ---------
    tables = {"exact": (np.where(live, mins, 1.0).astype(np.float32),
                        np.where(live, maxs, -1.0).astype(np.float32))}
    for gc in (96, 48, 32, 16):
        tables[f"gc{gc}"] = group_boxes(gc)
    names = list(tables)
    bounds = [np.stack(tables[k]) for k in names]       # (2, 3, n_k)
    splits = np.cumsum([b.shape[2] for b in bounds])[:-1]
    allmin = np.concatenate([b[0] for b in bounds], 1)  # (3, total)
    allmax = np.concatenate([b[1] for b in bounds], 1)

    counts = {k: [] for k in names}
    CH = 2048
    inv = np.float32(1.0) / D                            # (N, 3), inf ok
    for i in range(0, n_seg, CH):
        o = O[i:i + CH][:, :, None]                      # (c, 3, 1)
        iv = inv[i:i + CH][:, :, None]
        t1 = (allmin[None] - o) * iv                     # (c, 3, total)
        t2 = (allmax[None] - o) * iv
        t_near = np.minimum(t1, t2).max(1)
        t_far = np.maximum(t1, t2).min(1)
        useful = (t_far >= t_near) & (t_far > 0.0)
        for k, part in zip(names, np.split(useful, splits, axis=1)):
            counts[k].append(part.sum(1))
    rs = np.random.default_rng(0)
    for k in names:
        c = np.concatenate(counts[k])
        gc = 1 if k == "exact" else int(k[2:])
        straggler = float(np.mean(
            [c[rs.integers(0, n_seg, 4096)].max() for _ in range(64)]))
        print(json.dumps({
            "probe": f"dense_cand_{k}", "gc": gc,
            "n_boxes": int(tables[k][0].shape[1]),
            "mean_groups": round(float(c.mean()), 2),
            "p95_groups": int(np.percentile(c, 95)),
            "mean_spheres": round(float(c.mean()) * gc, 1),
            "straggler_groups": round(straggler, 1),
            "straggler_spheres": round(straggler * gc, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
