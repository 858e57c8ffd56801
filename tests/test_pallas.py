"""Pallas megakernel vs XLA wavefront renderer: same algorithm, same RNG contract,
same images (up to the bf16x2 attribute gather, ~1e-6). Runs in interpreter mode on
CPU; on real TPU the same asserts are exercised by integration scripts."""

import numpy as np
import pytest

from bevyray_tpu import RenderConfig, Renderer, rtiow
from bevyray_tpu.engine.pallas_renderer import PallasRenderer


@pytest.mark.parametrize("scene_fn,level", [
    (rtiow.material_test_scene, 3),
    (rtiow.simple_scene, 2),
])
def test_pallas_matches_xla(scene_fn, level):
    world = scene_fn()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=2, bounces=4,
                       level=level)
    want = Renderer(cfg).render(scene, cam, seed=5)
    got = PallasRenderer(cfg).render(scene, cam, seed=5)
    np.testing.assert_allclose(np.asarray(got.image), np.asarray(want.image),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.rt_depth), np.asarray(want.rt_depth),
                               atol=1e-3)
    assert float(got.rays_traced) == float(want.rays_traced)


def test_pallas_nonaligned_resolution():
    """Pixel counts that don't divide the tile size must pad correctly."""
    world = rtiow.material_test_scene()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=40 / 24)
    cfg = RenderConfig(width=40, height=24, samples_per_pixel=1, bounces=2, level=3)
    want = Renderer(cfg).render(scene, cam, seed=2)
    got = PallasRenderer(cfg).render(scene, cam, seed=2)
    np.testing.assert_allclose(np.asarray(got.image), np.asarray(want.image),
                               atol=5e-5)


def test_pallas_fast_rng_statistical():
    """The hardware-PRNG path (rejection-sampled balls) must agree with the XLA
    renderer statistically — same estimator, different random streams.

    The hardware PRNG only exists on real TPUs; off-TPU render_tiles silently
    falls back to the exact path, making this a (still useful) smoke test.
    """
    world = rtiow.material_test_scene()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=32, bounces=5,
                       level=3)
    want = Renderer(cfg).render(scene, cam, seed=5)
    got = PallasRenderer(cfg, exact_rng=False).render(scene, cam, seed=5)
    ig, iw = np.asarray(got.image), np.asarray(want.image)
    assert np.isfinite(ig).all()
    # Monte-Carlo noise at 32 spp ≈ few percent; means must agree much tighter.
    assert np.abs(ig - iw).mean() < 0.02
    assert abs(ig.mean() - iw.mean()) < 0.01


def test_candidate_walk_bit_matches_grouped_walk():
    """The per-lane candidate walk (pallas_intersect="candidates") must produce
    BIT-identical images to the grouped walk: same test arithmetic on exactly
    gathered f32 values (bf16 hi/mid/lo one-hot matmul reconstruction), a
    conservative slab mask, and the same ascending-index tie-keeping."""
    import dataclasses

    for scene_fn, seed in [(rtiow.material_test_scene, 7),
                           (lambda: rtiow.final_scene(seed=42, grid=4), 11)]:
        world = scene_fn()
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=1.0)
        cfg = RenderConfig(width=32, height=32, samples_per_pixel=2, bounces=4,
                           level=3, pallas_intersect="grouped")
        want = PallasRenderer(cfg).render(scene, cam, seed=seed)
        cfg_c = dataclasses.replace(cfg, pallas_intersect="candidates")
        got = PallasRenderer(cfg_c).render(scene, cam, seed=seed)
        np.testing.assert_array_equal(np.asarray(got.image),
                                      np.asarray(want.image))
        assert float(got.rays_traced) == float(want.rays_traced)


def test_candidate_group_sizes_bit_identical():
    """Candidate-group geometry is a pure perf knob: any pallas_cand_size
    (8 = finest sub-CAND_UNIT chunks, 16 = two-word fine groups, 24 = the
    chunk-8 multi-chunk case, 32 = round-2 default, 64 = chunked) must
    produce BIT-identical images — the visit set stays conservative and the
    visit order ascending-index."""
    import dataclasses

    world = rtiow.final_scene(seed=42, grid=4)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    base = RenderConfig(width=32, height=32, samples_per_pixel=2, bounces=4,
                        level=3, pallas_intersect="candidates")
    want = PallasRenderer(base).render(scene, cam, seed=11)
    for cs in (8, 24, 32, 64):
        cfg = dataclasses.replace(base, pallas_cand_size=cs)
        got = PallasRenderer(cfg).render(scene, cam, seed=11)
        np.testing.assert_array_equal(np.asarray(got.image),
                                      np.asarray(want.image),
                                      err_msg=f"cand_size={cs}")
        assert float(got.rays_traced) == float(want.rays_traced)


def test_candidate_walk_fuzz_random_scenes():
    """Random scenes across the group-size ladder (gc=32 single-chunk through
    gc=64+ chunked, overlapping spheres, degenerate radii) — the candidate walk
    must stay bit-identical to the grouped walk on every one."""
    import dataclasses

    from bevyray_tpu import (RaytracedCamera, RaytracedSphere, Raytracing,
                             StandardMaterial, Transform)
    from bevyray_tpu.scene.world import World

    for seed, n in [(0, 17), (1, 300), (2, 1100)]:
        rng = np.random.RandomState(seed)
        w = World()
        w.set_camera(Transform.from_xyz(0, 2, 9).looking_at((0, 0, 0)),
                     camera=RaytracedCamera(level=Raytracing.PURE))
        for _ in range(n):
            p = rng.uniform(-6, 6, 3)
            w.spawn_sphere(
                Transform.from_xyz(*p),
                RaytracedSphere(float(rng.uniform(0.05, 1.5))),
                StandardMaterial(base_color=tuple(rng.rand(3)),
                                 metallic=float(rng.rand() < 0.3),
                                 specular_transmission=float(rng.rand() < 0.1)))
        scene = w.extract(with_bvh=False)
        cam = w.camera_state(aspect=1.0)
        cfg = RenderConfig(width=16, height=16, samples_per_pixel=1, bounces=3,
                           level=3, pallas_intersect="grouped")
        want = PallasRenderer(cfg).render(scene, cam, seed=seed + 50)
        got = PallasRenderer(dataclasses.replace(
            cfg, pallas_intersect="candidates")).render(scene, cam,
                                                        seed=seed + 50)
        np.testing.assert_array_equal(np.asarray(got.image),
                                      np.asarray(want.image),
                                      err_msg=f"scene seed={seed} n={n}")
        if n == 1100:
            # gc=16 at 1152 padded spheres = 72 candidate groups — exercises
            # the MULTI-word (3×i32) per-lane mask path end-to-end.
            got3 = PallasRenderer(dataclasses.replace(
                cfg, pallas_intersect="candidates",
                pallas_cand_size=16)).render(scene, cam, seed=seed + 50)
            np.testing.assert_array_equal(np.asarray(got3.image),
                                          np.asarray(want.image),
                                          err_msg="3-word masks, gc=16")


def test_pallas_final_scene_many_spheres():
    """Multi-chunk sphere loop (508 spheres → 4 chunks of 128)."""
    world = rtiow.final_scene(seed=42)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=1, bounces=2, level=3)
    want = Renderer(cfg).render(scene, cam, seed=9)
    got = PallasRenderer(cfg).render(scene, cam, seed=9)
    np.testing.assert_allclose(np.asarray(got.image), np.asarray(want.image),
                               atol=5e-5)


def test_pallas_large_scene_capacity():
    """A scene an order of magnitude larger than the reference's (multi-group
    SMEM tables, many onehot chunks) must still match the XLA path."""
    import numpy as np
    from bevyray_tpu import (RaytracedCamera, RaytracedSphere, Raytracing,
                             StandardMaterial, Transform)
    from bevyray_tpu.scene.world import World

    rng = np.random.RandomState(2)
    world = World()
    world.set_camera(Transform.from_xyz(0, 4, 18).looking_at((0, 0, 0)),
                     camera=RaytracedCamera(level=Raytracing.PURE))
    world.spawn_sphere(Transform.from_xyz(0, -1000, 0), RaytracedSphere(1000.0),
                       StandardMaterial(base_color=(0.5, 0.5, 0.5)))
    for _ in range(1500):
        p = rng.uniform(-12, 12, 3)
        p[1] = rng.uniform(0.2, 2.5)
        world.spawn_sphere(Transform.from_xyz(*p),
                           RaytracedSphere(float(rng.uniform(0.1, 0.4))),
                           StandardMaterial(base_color=tuple(rng.rand(3))))
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=1, bounces=2, level=3)
    want = np.asarray(Renderer(cfg).render(scene, cam, seed=3).image)
    got = np.asarray(PallasRenderer(cfg).render(scene, cam, seed=3).image)
    # Dense overlapping spheres produce near-tie hits where a 1-ULP t difference
    # (XLA vs Mosaic FMA contraction) flips the winner and the whole path — so
    # robust metrics, not exact equality.
    err = np.abs(got - want)
    assert err.mean() < 2e-3, err.mean()
    assert (err.max(axis=-1) > 1e-3).mean() < 0.02


def _hollow_glass_world():
    """RTiOW hollow-glass trick: a negative-radius inner shell inside a
    dielectric sphere (valid geometry — hit_sphere only squares r, wgsl:375)."""
    from bevyray_tpu import (RaytracedCamera, RaytracedSphere, Raytracing,
                             StandardMaterial, Transform)
    from bevyray_tpu.scene.world import World

    w = World()
    w.set_camera(Transform.from_xyz(0, 0.6, 4).looking_at((0, 0.5, 0)),
                 camera=RaytracedCamera(level=Raytracing.PURE))
    w.spawn_sphere(Transform.from_xyz(0, -1000, 0), RaytracedSphere(1000.0),
                   StandardMaterial(base_color=(0.5, 0.5, 0.5)))
    glass = StandardMaterial(base_color=(1.0, 1.0, 1.0), ior=1.5,
                             specular_transmission=1.0)
    w.spawn_sphere(Transform.from_xyz(0, 0.5, 0), RaytracedSphere(0.5), glass)
    w.spawn_sphere(Transform.from_xyz(0, 0.5, 0), RaytracedSphere(-0.4), glass)
    w.spawn_sphere(Transform.from_xyz(-1.2, 0.5, 0), RaytracedSphere(0.5),
                   StandardMaterial(base_color=(0.9, 0.3, 0.2)))
    return w


def test_pallas_hollow_glass_negative_radius():
    """Negative radii must intersect in the megakernel (validity is a separate
    SMEM row; r>0 culling would silently delete the bubble)."""
    world = _hollow_glass_world()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=2, bounces=6,
                       level=3)
    want = Renderer(cfg).render(scene, cam, seed=4)
    got = PallasRenderer(cfg).render(scene, cam, seed=4)
    np.testing.assert_allclose(np.asarray(got.image), np.asarray(want.image),
                               atol=5e-5)
    # The bubble must actually matter: rendering without it differs.
    world_solid = _hollow_glass_world()
    world_solid.despawn(2)   # the -0.4 inner shell
    solid = PallasRenderer(cfg).render(world_solid.extract(with_bvh=False),
                                       cam, seed=4)
    assert np.abs(np.asarray(got.image) - np.asarray(solid.image)).max() > 1e-3


def test_pallas_defocus_exact_parity():
    """Thin-lens sampling must be bit-comparable between the megakernel's exact
    path (jnp trig) and the XLA raygen."""
    from bevyray_tpu import RaytracedCamera, Raytracing, Transform

    world = rtiow.material_test_scene()
    world.set_camera(world.camera_transform,
                     camera=RaytracedCamera(level=Raytracing.PURE,
                                            aperture=0.3, focus_distance=4.0))
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=2, bounces=3,
                       level=3, defocus=True)
    want = Renderer(cfg).render(scene, cam, seed=8)
    got = PallasRenderer(cfg).render(scene, cam, seed=8)
    np.testing.assert_allclose(np.asarray(got.image), np.asarray(want.image),
                               atol=5e-5)


def test_persistent_matches_classic_loop():
    """The persistent-sampling driver (lanes restart on their next sample)
    must produce ulp-identical exact-RNG images to the classic per-sample
    loop it replaced — draws are keyed by (pixel, sample, slot) in both."""
    import functools

    import jax
    import jax.numpy as jnp

    from bevyray_tpu.kernels.pallas.megakernel import (prepare_pallas_scene,
                                                       render_tiles,
                                                       unshuffle_blocks)

    world = rtiow.material_test_scene()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=3, bounces=4,
                       level=3)
    pscene = jax.jit(prepare_pallas_scene)(scene)

    def run(persistent):
        f = jax.jit(functools.partial(render_tiles, config=cfg, exact_rng=True,
                                      persistent=persistent))
        r, g, b, depth, segs = f(pscene, cam, frame_seed=jnp.uint32(9))
        return (np.stack([np.asarray(unshuffle_blocks(x, cfg))
                          for x in (r, g, b)], -1),
                np.asarray(unshuffle_blocks(depth, cfg)), float(segs))

    ip, dp_, sp_ = run(True)
    ic, dc, sc_ = run(False)
    # Same draws per (pixel, sample, slot); only XLA fma contraction differs
    # between the two loop shapes, so agreement is ulp-level, not bitwise.
    np.testing.assert_allclose(ip, ic, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(dp_, dc, rtol=1e-6, atol=1e-5)
    assert sp_ == sc_
