"""Phase-split bounce-0 shortlists (kernels/pallas/primary.py + megakernel
phase-split mode).

The contract under test: with identical exact-RNG draws, the phase-split
kernel (coherent shortlist bounce 0 + stored-state persistent bounces) must
reproduce the single persistent loop's image — any disagreement beyond
cross-sample summation-order ulps means a shortlist culled a hittable sphere
or the stored-state restart replayed the wrong sample.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevyray_tpu import RenderConfig, rtiow
from bevyray_tpu.engine.pallas_renderer import PallasRenderer
from bevyray_tpu.scene.components import (PerspectiveProjection,
                                          RaytracedCamera, RaytracedSphere,
                                          StandardMaterial, Transform)
from bevyray_tpu.scene.world import World


def _render_pair(world, cfg_kwargs, seed=7):
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=cfg_kwargs["width"] / cfg_kwargs["height"])
    split = PallasRenderer(RenderConfig(**cfg_kwargs, pallas_primary="split"),
                           exact_rng=True).render(scene, cam, seed=seed)
    off = PallasRenderer(RenderConfig(**cfg_kwargs, pallas_primary="off"),
                         exact_rng=True).render(scene, cam, seed=seed)
    return split, off


def test_split_matches_persistent_loop():
    world = rtiow.final_scene(seed=3, grid=4)
    cfg = dict(width=96, height=64, samples_per_pixel=4, bounces=4, level=3)
    split, off = _render_pair(world, cfg)
    assert float(split.rays_traced) == float(off.rays_traced)
    np.testing.assert_allclose(np.asarray(split.image), np.asarray(off.image),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(split.rt_depth),
                               np.asarray(off.rt_depth), rtol=1e-5, atol=1e-4)


def test_split_matches_with_defocus_and_edge_blocks():
    # 100×72 exercises partially off-image edge blocks; defocus exercises the
    # aperture-inflated frustum margins.
    world = rtiow.final_scene(seed=11, grid=3)
    cfg = dict(width=100, height=72, samples_per_pixel=3, bounces=3, level=3,
               defocus=True)
    split, off = _render_pair(world, cfg)
    assert float(split.rays_traced) == float(off.rays_traced)
    np.testing.assert_allclose(np.asarray(split.image), np.asarray(off.image),
                               atol=1e-5)


def test_primary_hits_identical_random_scenes():
    # bounces=0, spp=1: the frame reduces to the primary hit alone, so the
    # depth map must be BIT-identical between the shortlist walk and the full
    # walk — any mismatch is a conservativeness bug in the frustum culling.
    rng = np.random.default_rng(123)
    for trial in range(3):
        world = World()
        for _ in range(40):
            p = rng.uniform(-6, 6, 3)
            world.spawn_sphere(
                Transform.from_xyz(float(p[0]), float(p[1]), float(p[2])),
                RaytracedSphere(radius=float(rng.uniform(0.1, 2.5))),
                StandardMaterial(base_color=tuple(rng.uniform(0, 1, 3))))
        eye = rng.uniform(-2, 2, 3) + (0, 0, 9)
        world.set_camera(
            Transform.from_xyz(*(float(v) for v in eye)).looking_at(
                tuple(float(v) for v in rng.uniform(-1, 1, 3))),
            PerspectiveProjection(), RaytracedCamera())
        cfg = dict(width=96, height=64, samples_per_pixel=1, bounces=0,
                   level=3)
        split, off = _render_pair(world, cfg, seed=trial)
        np.testing.assert_array_equal(np.asarray(split.rt_depth),
                                      np.asarray(off.rt_depth))


def test_chunked_early_out_walk_matches(monkeypatch):
    # Force the chunked early-out path (normally taken only for shortlists
    # larger than SL_WALK_ALL_MAX) and pin it against the plain loop.
    from bevyray_tpu.kernels.pallas import megakernel
    monkeypatch.setattr(megakernel, "SL_WALK_ALL_MAX", 0)
    world = rtiow.final_scene(seed=3, grid=4)
    cfg = dict(width=96, height=64, samples_per_pixel=2, bounces=3, level=3)
    split, off = _render_pair(world, cfg)
    assert float(split.rays_traced) == float(off.rays_traced)
    np.testing.assert_allclose(np.asarray(split.image), np.asarray(off.image),
                               atol=1e-5)


def test_overflow_blocks_fall_back_to_full_walk(monkeypatch):
    # Shrink the capacity cap so every block overflows; the kernel must take
    # the per-block full-walk branch and still match.
    from bevyray_tpu.kernels.pallas import primary
    monkeypatch.setattr(primary, "SL_MAX", 8)
    world = rtiow.final_scene(seed=3, grid=4)
    cfg = dict(width=96, height=64, samples_per_pixel=2, bounces=2, level=3)
    split, off = _render_pair(world, cfg)
    assert float(split.rays_traced) == float(off.rays_traced)
    np.testing.assert_allclose(np.asarray(split.image), np.asarray(off.image),
                               atol=1e-5)


def test_split_gate_raises_on_unsupported_spp():
    from bevyray_tpu.kernels.pallas.megakernel import MAX_SPLIT_SPP
    world = rtiow.final_scene(seed=3, grid=2)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=64, height=64,
                       samples_per_pixel=MAX_SPLIT_SPP + 1, bounces=1,
                       level=3, pallas_primary="split")
    with pytest.raises(ValueError, match="samples_per_pixel"):
        PallasRenderer(cfg, exact_rng=True).render(scene, cam, seed=0)


def test_auto_disables_above_cap():
    from bevyray_tpu.kernels.pallas.megakernel import MAX_SPLIT_SPP
    world = rtiow.final_scene(seed=3, grid=2)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    r = PallasRenderer(RenderConfig(width=64, height=64,
                                    samples_per_pixel=MAX_SPLIT_SPP + 1,
                                    bounces=1, level=3), exact_rng=True)
    pscene = r.prepare(scene)
    assert r.shortlists(pscene, cam) == (None, None, None)
    r.render(scene, cam, seed=0)  # runs through the plain persistent loop


def test_fast_disc_is_bit_identical():
    # pallas_fast_disc drops the explicit disc ≥ 0 test (NaN compares false);
    # the accept set — and therefore the image — must be BIT-identical.
    world = rtiow.final_scene(seed=3, grid=4)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=96 / 64)
    cfg = dict(width=96, height=64, samples_per_pixel=2, bounces=3, level=3)
    for primary in ("split", "off"):
        imgs = []
        for fd in (False, True):
            r = PallasRenderer(RenderConfig(**cfg, pallas_primary=primary,
                                            pallas_fast_disc=fd),
                               exact_rng=True)
            imgs.append(np.asarray(r.render(scene, cam, seed=5).image))
        np.testing.assert_array_equal(imgs[0], imgs[1])


def test_auto_gate_matches_measured_decision_surface():
    # A 4-sphere scene culls nothing: at 16 spp the restart fetch dominates
    # and "auto" must stay on the plain persistent loop (measured 5% slower
    # split); at spp <= 4 the fetch is cheap and split won (21% on ch9), so
    # "auto" keeps it. "split" always forces it; big scenes always qualify.
    world = rtiow.material_test_scene()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    tiny16 = dict(width=64, height=64, samples_per_pixel=16, bounces=2,
                  level=3)
    r_auto = PallasRenderer(RenderConfig(**tiny16), exact_rng=True)
    assert r_auto.shortlists(r_auto.prepare(scene), cam) == (None, None, None)
    tiny4 = dict(tiny16, samples_per_pixel=4)
    r_lowspp = PallasRenderer(RenderConfig(**tiny4), exact_rng=True)
    sl, _, _ = r_lowspp.shortlists(r_lowspp.prepare(scene), cam)
    assert sl is not None
    r_force = PallasRenderer(RenderConfig(**tiny16, pallas_primary="split"),
                             exact_rng=True)
    sl, _, _ = r_force.shortlists(r_force.prepare(scene), cam)
    assert sl is not None
    big = rtiow.final_scene(seed=3)
    r_big = PallasRenderer(RenderConfig(**tiny16), exact_rng=True)
    sl, _, _ = r_big.shortlists(r_big.prepare(big.extract(with_bvh=False)),
                                big.camera_state(aspect=1.0))
    assert sl is not None


def test_shortlist_builder_is_conservative_pointwise():
    # Direct property: every sphere a block's corner/center pinhole rays can
    # hit sits in that block's shortlist (sampled rays, generous count).
    from bevyray_tpu.kernels.pallas.megakernel import (BLOCK_H, BLOCK_W,
                                                       block_grid,
                                                       prepare_pallas_scene)
    from bevyray_tpu.kernels.pallas.primary import build_block_shortlists

    world = rtiow.final_scene(seed=5, grid=5)
    scene = world.extract(with_bvh=False)
    config = RenderConfig(width=192, height=128, samples_per_pixel=1,
                          bounces=0, level=3)
    cam = world.camera_state(aspect=192 / 128)
    pscene = jax.jit(prepare_pallas_scene)(scene)
    sph = np.asarray(pscene.sph)
    sl, meta = build_block_shortlists(sph, cam, config)
    nbx, nby = block_grid(config)

    pos = np.array([float(cam.position.x), float(cam.position.y),
                    float(cam.position.z)])
    fwd = np.array([float(cam.direction.x), float(cam.direction.y),
                    float(cam.direction.z)])
    up = np.array([float(cam.up.x), float(cam.up.y), float(cam.up.z)])
    right = np.cross(fwd, up)
    scale = np.tan(float(cam.fov) * 0.5)
    aspect = float(cam.aspect)
    cx, cy, cz, r2 = sph
    rng = np.random.default_rng(0)
    for b in rng.choice(nbx * nby, size=min(12, nbx * nby), replace=False):
        bx, by = b % nbx, b // nbx
        idxs = set(sl[b, 4][sl[b, 3] > -1e29].astype(int))
        for _ in range(64):
            px = bx * BLOCK_W + rng.uniform(0, BLOCK_W)
            py = by * BLOCK_H + rng.uniform(0, BLOCK_H)
            u, v = px / 192, py / 128
            d = (fwd + right * ((u * 2 - 1) * aspect * scale)
                 + up * ((1 - v * 2) * scale))
            d /= np.linalg.norm(d)
            oc = np.stack([cx, cy, cz], 1) - pos
            h = oc @ d
            disc = h * h - (np.einsum("ij,ij->i", oc, oc) - r2)
            hit = (disc >= 0) & (h + np.sqrt(np.maximum(disc, 0)) > 1e-3)
            for s_i in np.nonzero(hit)[0]:
                if not np.all(sph[:, s_i] == sph[:, 0]) or s_i == 0:
                    assert s_i in idxs, (b, s_i)


def test_shortlist_local_gather_bit_identical():
    """Phase-A attribute gather from the per-block shortlist-local table must
    be BIT-identical to the global-table gather (same bf16 hi/lo rows, local
    one-hot selection)."""
    import functools

    import jax
    import jax.numpy as jnp

    from bevyray_tpu.kernels.pallas.megakernel import (prepare_pallas_scene,
                                                       render_tiles,
                                                       unshuffle_blocks)
    from bevyray_tpu.kernels.pallas.primary import shortlists_for

    world = rtiow.final_scene(seed=42, grid=6)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=96, height=96, samples_per_pixel=2, bounces=3,
                       level=3)
    pscene = jax.jit(prepare_pallas_scene)(scene)
    sl, meta, slattr = shortlists_for(np.asarray(pscene.sph), cam, cfg, 2,
                                      attr=np.asarray(pscene.attr))
    assert sl is not None and slattr is not None

    def run(sa):
        f = jax.jit(functools.partial(render_tiles, config=cfg,
                                      exact_rng=True))
        r, g, b, d, segs = f(pscene, cam, frame_seed=jnp.uint32(5),
                             sl=jnp.asarray(sl), slmeta=jnp.asarray(meta),
                             slattr=sa)
        img = np.stack([np.asarray(unshuffle_blocks(x, cfg))
                        for x in (r, g, b)], -1)
        return img, float(segs)

    with_local, segs_l = run(jnp.asarray(slattr))
    with_global, segs_g = run(None)
    np.testing.assert_array_equal(with_local, with_global)
    assert segs_l == segs_g


def test_shortlist_capacity_pow2_buckets():
    # Moving-camera compile stability: capacities are pow2 buckets in
    # [SL_CHUNK, SL_MAX]; overflow demand still caps at SL_MAX.
    from bevyray_tpu.kernels.pallas.primary import (SL_CHUNK, SL_MAX,
                                                    shortlist_capacity)
    cases = {0: SL_CHUNK, 1: SL_CHUNK, 8: 8, 9: 16, 23: 32, 33: 64, 64: 64,
             65: 128, 300: 512, 512: 512, 5000: SL_MAX}
    for need, want in cases.items():
        got = shortlist_capacity(np.array([need, max(need // 2, 0)]))
        assert got == want, (need, got, want)
        assert got & (got - 1) == 0


def test_orbit_shares_one_compiled_shortlist_shape():
    # A 60° orbit around the final scene must touch at most two capacity
    # buckets (each distinct capacity is a megakernel recompile) — host-only.
    from bevyray_tpu.kernels.pallas.megakernel import prepare_pallas_scene
    from bevyray_tpu.kernels.pallas.primary import build_block_shortlists
    from bevyray_tpu.scene.components import Transform

    world = rtiow.final_scene(seed=42, grid=8)
    scene = world.extract(with_bvh=False)
    cfg = RenderConfig(width=256, height=192, samples_per_pixel=2, bounces=2,
                       level=3)
    sph = np.asarray(jax.jit(prepare_pallas_scene)(scene).sph)
    base = np.asarray(world.camera_transform.translation, np.float64)
    target = base + np.asarray(world.camera_transform.forward, np.float64)
    rel = base - target
    radius, th0 = np.hypot(rel[0], rel[2]), np.arctan2(rel[2], rel[0])
    caps = set()
    for i in range(12):
        th = th0 + np.deg2rad(60.0) * (i / 11 - 0.5)
        pos = target + np.array([radius * np.cos(th), rel[1],
                                 radius * np.sin(th)])
        world.set_camera(Transform.from_xyz(*pos).looking_at(tuple(target)))
        sl, _ = build_block_shortlists(sph, world.camera_state(aspect=4 / 3),
                                       cfg)
        caps.add(sl.shape[-1])
    assert len(caps) <= 2, caps


def test_shortlist_attr_tables_vectorized_matches_loop():
    from bevyray_tpu.kernels.pallas.megakernel import prepare_pallas_scene
    from bevyray_tpu.kernels.pallas.primary import (build_block_shortlists,
                                                    shortlist_attr_tables)

    world = rtiow.final_scene(seed=9, grid=6)
    scene = world.extract(with_bvh=False)
    cfg = RenderConfig(width=192, height=128, samples_per_pixel=2, bounces=2,
                       level=3)
    cam = world.camera_state(aspect=192 / 128)
    pscene = jax.jit(prepare_pallas_scene)(scene)
    sph, attr = np.asarray(pscene.sph), np.asarray(pscene.attr)
    sl, meta = build_block_shortlists(sph, cam, cfg)
    got = shortlist_attr_tables(sl, meta, attr)
    assert got is not None

    # Reference implementation: the pre-vectorization per-block loop.
    n_blocks, _, k_cap = sl.shape
    k_pad = max(32, -(-k_cap // 32) * 32)
    want = np.zeros((n_blocks, attr.shape[0], k_pad), attr.dtype)
    live = sl[:, 3, :] > np.float32(-1e29)
    idx = sl[:, 4, :].astype(np.int64)
    for b in range(n_blocks):
        m = live[b]
        if m.any():
            want[b, :, :k_cap][:, m] = attr[:, idx[b, m]]
    np.testing.assert_array_equal(got, want)
