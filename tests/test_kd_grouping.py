"""kd cluster grouping (kernels/pallas/grouping.py) — invariants + value-identity.

The kd order is a pure culling-quality permutation of the prepared sphere
table: group/candidate AABBs are unions over consecutive runs, every sphere is
tested with identical arithmetic whenever its group is entered, and a sphere's
own group always passes the slab test — so images must be BIT-identical to the
morton ordering in interpret mode (exact ties between distinct spheres are the
only escape and the fixed-seed scenes have none).
"""

import numpy as np

from bevyray_tpu import RenderConfig, rtiow
from bevyray_tpu.engine.pallas_renderer import PallasRenderer
from bevyray_tpu.kernels.pallas.grouping import kd_order


def _scene_arrays(world):
    sp = world.extract(with_bvh=False).spheres
    return (np.asarray(sp.cx), np.asarray(sp.cy), np.asarray(sp.cz),
            np.asarray(sp.radius), np.asarray(sp.valid))


def test_kd_order_is_an_aligned_quarantined_permutation():
    cx, cy, cz, radius, valid = _scene_arrays(rtiow.final_scene(seed=11))
    gc = 16
    perm = kd_order(cx, cy, cz, radius, valid, gc)
    n = cx.shape[0]
    assert sorted(perm.tolist()) == list(range(n))        # permutation
    # Deterministic.
    np.testing.assert_array_equal(perm, kd_order(cx, cy, cz, radius, valid, gc))
    r = np.abs(radius)
    live = valid & (r > 0)
    ext = (np.stack([cx, cy, cz], 1)[live].max(0)
           - np.stack([cx, cy, cz], 1)[live].min(0)).max()
    big = live & (r > 0.25 * ext)
    n_big, n_live = int(big.sum()), int(live.sum())
    assert n_big >= 1                                      # the ground sphere
    assert big[perm[:n_big]].all()                         # quarantine leads
    assert not live[perm[n_live:]].any()                   # padding trails
    # Clusters beat morton runs on total box volume (the quality the
    # permutation exists for): union boxes over gc-runs of live spheres.
    from bevyray_tpu.kernels.pallas.megakernel import _morton_key
    import jax.numpy as jnp

    morton = np.asarray(jnp.argsort(_morton_key(cx, cy, cz, radius, valid)))

    def box_volume(order):
        c = np.stack([cx, cy, cz])[:, order]
        rr = r[order]
        lv = live[order]
        mins = np.where(lv, c - rr, np.inf)
        maxs = np.where(lv, c + rr, -np.inf)
        k = n // gc
        gmn = mins[:, :k * gc].reshape(3, k, gc).min(2)
        gmx = maxs[:, :k * gc].reshape(3, k, gc).max(2)
        d = np.clip(gmx - gmn, 0, None)
        vol = d[0] * d[1] * d[2]
        return float(np.where(np.isfinite(vol), vol, 0.0)[1:].sum())  # skip
        # the quarantine group, whose giant box both orders share

    assert box_volume(perm) < box_volume(morton)


def test_kd_sah_rule_is_an_aligned_quarantined_permutation():
    """rule="sah" (the count-weighted surface-area cut) obeys the same
    structural invariants as the median rule and does not lose on the
    objective it greedily optimizes (total group surface area)."""
    cx, cy, cz, radius, valid = _scene_arrays(rtiow.final_scene(seed=11))
    gc = 16
    sah = kd_order(cx, cy, cz, radius, valid, gc, rule="sah")
    med = kd_order(cx, cy, cz, radius, valid, gc)
    n = cx.shape[0]
    assert sorted(sah.tolist()) == list(range(n))
    np.testing.assert_array_equal(
        sah, kd_order(cx, cy, cz, radius, valid, gc, rule="sah"))
    r = np.abs(radius)
    live = valid & (r > 0)
    ext = (np.stack([cx, cy, cz], 1)[live].max(0)
           - np.stack([cx, cy, cz], 1)[live].min(0)).max()
    big = live & (r > 0.25 * ext)
    n_big, n_live = int(big.sum()), int(live.sum())
    assert big[sah[:n_big]].all()
    assert not live[sah[n_live:]].any()

    def sa_total(order):
        c = np.stack([cx, cy, cz])[:, order]
        rr = r[order]
        lv = live[order]
        k = n // gc
        mins = np.where(lv, c - rr, np.inf)[:, :k * gc].reshape(3, k, gc).min(2)
        maxs = np.where(lv, c + rr, -np.inf)[:, :k * gc].reshape(3, k, gc).max(2)
        d = np.clip(maxs - mins, 0, None)
        s = d[0] * d[1] + d[1] * d[2] + d[0] * d[2]
        return float(np.where(np.isfinite(s), s, 0.0)[1:].sum())

    assert sa_total(sah) <= sa_total(med)


def test_kd_rule_flip_misses_prepared_scene_cache():
    """Flipping grouping.KD_RULE on a LIVE renderer must re-prepare — a
    stale permutation is invisible in images (pure perf knob), so only the
    cache key guards perf batteries from measuring the wrong arm."""
    from bevyray_tpu.kernels.pallas import grouping

    world = rtiow.final_scene(seed=11)
    scene = world.extract(with_bvh=False)
    cfg = RenderConfig(width=64, height=64, samples_per_pixel=1, bounces=1,
                       level=3, pallas_cand_size=16)
    r = PallasRenderer(cfg, exact_rng=True)
    assert grouping.KD_RULE == "median"   # shipped default
    med = np.asarray(r.prepare(scene).sph)
    grouping.KD_RULE = "sah"
    try:
        sah = np.asarray(r.prepare(scene).sph)
    finally:
        grouping.KD_RULE = "median"
    assert not np.array_equal(med, sah)   # different permutation delivered
    np.testing.assert_array_equal(np.asarray(r.prepare(scene).sph), med)


def _render(grouping, chunk, intersect, world, cand_size=0):
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    # Distinct sphere_chunk => distinct compiled program per arm (padding is
    # value-inert), so the second arm cannot ride the first's jit cache.
    cfg = RenderConfig(width=64, height=64, samples_per_pixel=4, bounces=3,
                       level=3, pallas_intersect=intersect,
                       pallas_primary="split", sphere_chunk=chunk,
                       pallas_cand_size=cand_size, pallas_grouping=grouping)
    return PallasRenderer(cfg, exact_rng=True).render(scene, cam, seed=9)


def test_kd_bit_identical_to_morton_candidates_walk():
    world = rtiow.final_scene(seed=5, grid=4)
    kd = _render("kd", 144, "candidates", world, cand_size=16)
    mo = _render("morton", 148, "candidates", world, cand_size=16)
    assert float(kd.rays_traced) == float(mo.rays_traced)
    np.testing.assert_array_equal(np.asarray(kd.image), np.asarray(mo.image))
    np.testing.assert_array_equal(np.asarray(kd.rt_depth),
                                  np.asarray(mo.rt_depth))


def test_kd_bit_identical_to_morton_grouped_walk():
    world = rtiow.final_scene(seed=7, grid=3)
    kd = _render("kd", 152, "grouped", world)
    mo = _render("morton", 156, "grouped", world)
    assert float(kd.rays_traced) == float(mo.rays_traced)
    np.testing.assert_array_equal(np.asarray(kd.image), np.asarray(mo.image))
