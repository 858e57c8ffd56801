"""KD-clustered candidate grouping probe (CPU-exact geometry replay).

exp_dense_floor.py showed the dense-scene candidate wall is NOT geometric:
per-sphere-exact slab candidates average 4.3 spheres/segment while the
shipped gc=96 Morton-run grouping carries 543 — and mean ENTERED groups is
nearly flat in group count (5.65 @ 54 boxes -> 8.15 @ 320), i.e. the union
boxes of Morton-consecutive runs overlap rays almost independently of
granularity.  The lever is group SHAPE, not group size.

This probe evaluates a drop-in alternative ordering: equal-size spatially
tight clusters from a recursive widest-axis median split (leaf = one
candidate group, boundaries aligned to the global gc grid, oversized spheres
quarantined at the front exactly like the shipped morton key).  A pure
permutation — same table sizes, same mask machinery, same kernel — so if the
entered-group statistics drop materially, implementation is a new sort key
in prepare_pallas_scene.

Evaluates BOTH benchmark scenes:
  - dense 5,000-sphere bench (exp_large_scene.make_world) at gc 96/48/32/16
  - headline RTiOW final scene (508 spheres -> 512 padded) at gc 16/32

    python scripts/exp_kd_grouping.py     # CPU, ~5-10 min
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def kd_order(cx, cy, cz, radius, valid, gc):
    """Permutation putting live spheres into equal-size spatially-tight
    clusters: oversized spheres (shipped quarantine rule: r > 0.25*extent)
    first, then recursive widest-axis median splits with split points aligned
    to the global gc grid (so every gc-sized run of the final order is one
    spatial cluster), padding last."""
    live = np.asarray(valid) & (np.asarray(radius) != 0)
    c = np.stack([np.asarray(cx), np.asarray(cy), np.asarray(cz)], 1)
    r = np.abs(np.asarray(radius))
    ext = (c[live].max(0) - c[live].min(0)).max() if live.any() else 1.0
    big = live & (r > 0.25 * ext)
    rest = np.flatnonzero(live & ~big)
    out = list(np.flatnonzero(big))

    def split(idx, offset):
        """idx: sphere ids to order; offset: global position of idx[0]."""
        # Room left in the group the offset sits in:
        room = (-offset) % gc or gc
        if len(idx) <= room:
            out.extend(idx)
            return
        if len(idx) <= gc and room == gc:
            out.extend(idx)
            return
        ax = np.ptp(c[idx], axis=0).argmax()
        order = idx[np.argsort(c[idx, ax], kind="stable")]
        # Align the split to the global gc grid, as close to median as we can.
        half = len(idx) // 2
        cut = room + max(0, (half - room) // gc) * gc if half >= room else room
        split(order[:cut], offset)
        split(order[cut:], offset + cut)

    split(rest, len(out))
    out.extend(np.flatnonzero(~live))
    perm = np.asarray(out)
    assert perm.shape[0] == c.shape[0]
    return perm


def boxes_over_order(cx, cy, cz, radius, valid, perm, gc):
    c = np.stack([np.asarray(cx), np.asarray(cy), np.asarray(cz)])[:, perm]
    r = np.abs(np.asarray(radius))[perm]
    live = np.asarray(valid)[perm] & (r > 0)
    mins = np.where(live, c - r, np.inf).astype(np.float32)
    maxs = np.where(live, c + r, -np.inf).astype(np.float32)
    s = c.shape[1]
    n = -(-s // gc)
    pad = n * gc - s
    mn = np.concatenate([mins, np.full((3, pad), np.inf, np.float32)], 1)
    mx = np.concatenate([maxs, np.full((3, pad), -np.inf, np.float32)], 1)
    gmn = mn.reshape(3, n, gc).min(2)
    gmx = mx.reshape(3, n, gc).max(2)
    empty = ~np.isfinite(gmn[0])
    return (np.where(empty, 1.0, gmn).astype(np.float32),
            np.where(empty, -1.0, gmx).astype(np.float32))


def entered_stats(O, D, gmn, gmx, label, gc):
    n_seg = O.shape[0]
    inv = np.float32(1.0) / D
    counts = []
    CH = 4096
    for i in range(0, n_seg, CH):
        o = O[i:i + CH][:, :, None]
        iv = inv[i:i + CH][:, :, None]
        t1 = (gmn[None] - o) * iv
        t2 = (gmx[None] - o) * iv
        t_near = np.minimum(t1, t2).max(1)
        t_far = np.maximum(t1, t2).min(1)
        counts.append(((t_far >= t_near) & (t_far > 0.0)).sum(1))
    c = np.concatenate(counts)
    rs = np.random.default_rng(0)
    straggler = float(np.mean(
        [c[rs.integers(0, n_seg, 4096)].max() for _ in range(64)]))
    print(json.dumps({
        "probe": label, "gc": gc, "n_boxes": int(gmn.shape[1]),
        "mean_groups": round(float(c.mean()), 2),
        "p95_groups": int(np.percentile(c, 95)),
        "mean_spheres": round(float(c.mean()) * gc, 1),
        "straggler_groups": round(straggler, 1),
        "straggler_spheres": round(straggler * gc, 1),
    }), flush=True)


def replay_segments(world, W, H, SPP, BOUNCES):
    import jax
    import jax.numpy as jnp
    from bevyray_tpu import RenderConfig
    from bevyray_tpu.core import rng as rngmod
    from bevyray_tpu.engine import slots
    from bevyray_tpu.kernels.intersect import (gather_materials,
                                               intersect_spheres,
                                               make_hit_info)
    from bevyray_tpu.kernels.raygen import generate_rays, pixel_uv
    from bevyray_tpu.kernels.shade import scatter

    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=W / H)
    config = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                          bounces=BOUNCES, level=3)
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
    return (np.concatenate(seg_o).astype(np.float32),
            np.concatenate(seg_d).astype(np.float32), scene)


def run_scene(tag, world, W, H, SPP, BOUNCES, gcs):
    import jax.numpy as jnp
    from bevyray_tpu.kernels.pallas.megakernel import _morton_key

    O, D, scene = replay_segments(world, W, H, SPP, BOUNCES)
    print(json.dumps({"probe": f"{tag}_segments", "n_seg": int(O.shape[0])}),
          flush=True)
    sp = scene.spheres
    morton = np.asarray(jnp.argsort(
        _morton_key(sp.cx, sp.cy, sp.cz, sp.radius, sp.valid)))
    for gc in gcs:
        kd = kd_order(sp.cx, sp.cy, sp.cz, sp.radius, np.asarray(sp.valid), gc)
        for name, perm in (("morton", morton), ("kd", kd)):
            gmn, gmx = boxes_over_order(sp.cx, sp.cy, sp.cz, sp.radius,
                                        np.asarray(sp.valid), perm, gc)
            entered_stats(O, D, gmn, gmx, f"{tag}_{name}_gc{gc}", gc)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from exp_large_scene import make_world
    from bevyray_tpu import rtiow

    run_scene("dense", make_world(), 320, 192, 2, 4, gcs=(96, 48, 32, 16))
    run_scene("headline", rtiow.final_scene(seed=42), 960, 540, 2, 4,
              gcs=(16, 32))
    return 0


if __name__ == "__main__":
    sys.exit(main())
