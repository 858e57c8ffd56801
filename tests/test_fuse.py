"""Block fusion (PHASE_FUSE — phase-split tile-tail pooling) bit-identity.

Fusing F pixel blocks into one kernel instance reschedules WHICH lanes trace
which parked samples per iteration, but every (pixel, sample) path sees the
same exact-RNG draws and per-pixel accumulation order, so images must be
BIT-identical to the unfused program — and the live-segment counter must
agree exactly (fusion changes iterations, never traced segments).

Reference behavior under reproduction: raytrace.wgsl:174-224 (per-sample
loop); fusion is a pure TPU scheduling transform on top of it.
"""

import dataclasses

import numpy as np
import pytest

from bevyray_tpu import (RaytracedSphere, RenderConfig, StandardMaterial,
                         Transform, rtiow)
from bevyray_tpu.engine.pallas_renderer import PallasRenderer
from bevyray_tpu.kernels.pallas import megakernel as mk
from bevyray_tpu.scene.world import World


def _render(cfg, scene, cam, fuse, seed, chunk):
    old = mk.PHASE_FUSE
    mk.PHASE_FUSE = fuse
    try:
        r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
        f = r.render(scene, cam, seed=seed)
        return np.asarray(f.image), float(f.rays_traced)
    finally:
        mk.PHASE_FUSE = old


def test_resolve_fuse():
    old = mk.PHASE_FUSE
    try:
        mk.PHASE_FUSE = "auto"
        assert mk._resolve_fuse(510, 16, True) == 2   # full 15-plane default
        assert mk._resolve_fuse(510, 16, True, 512, 10) == 4   # headline ship
        assert mk._resolve_fuse(510, 16, True, 512, 11) == 4   # pre-DEPTH_IN_A
        assert mk._resolve_fuse(510, 16, True, 512, 14) == 2   # emissive (old)
        assert mk._resolve_fuse(510, 16, True, 512, 13) == 2   # emissive ship
        # Round-5 DENSEFUSE point: auto opens fuse 8 at spp<=4 on dense
        # scenes (default n_spheres_padded here is huge), incl. the 6.7%-pad
        # dense bench grid (60 -> 64).
        assert mk._resolve_fuse(60, 4, True) == 8     # dense bench shape
        assert mk._resolve_fuse(64, 4, True) == 8
        assert mk._resolve_fuse(510, 4, True) == 8    # pads 510 -> 512
        assert mk._resolve_fuse(60, 4, True, 1024) == 4   # not dense -> 4
        assert mk._resolve_fuse(240, 4, True, 512, 10) == 4  # 720p headline
        assert mk._resolve_fuse(17, 2, True) == 2     # pads 17 -> 18
        assert mk._resolve_fuse(7, 4, True) == 1      # padding waste > 6%
        assert mk._resolve_fuse(64, 4, False) == 1    # split-only
        assert mk._resolve_fuse(16, 4, True, 32) == 1  # tiny scene gate
        mk.PHASE_FUSE = 8                              # explicit overrides
        assert mk._resolve_fuse(64, 4, True, 32) == 8
        mk.PHASE_FUSE = 4
        assert mk._resolve_fuse(64, 4, True) == 4
        assert mk._resolve_fuse(64, 16, True) == 2    # clamped by plane cap
        mk.PHASE_FUSE = 1
        assert mk._resolve_fuse(64, 4, True) == 1
    finally:
        mk.PHASE_FUSE = old


def test_fuse_bit_identical_materials():
    """4-sphere scene (grouped walk), 2×2 block grid, fuse 1/2/4."""
    w = rtiow.material_test_scene()
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1.0)
    cfg = RenderConfig(width=128, height=128, samples_per_pixel=4, bounces=4,
                       level=3)
    base, segs0 = _render(cfg, scene, cam, 1, seed=11, chunk=3101)
    for fuse, chunk in ((2, 3102), (4, 3104)):
        img, segs = _render(cfg, scene, cam, fuse, seed=11, chunk=chunk)
        assert segs == segs0
        assert np.array_equal(base, img), f"fuse={fuse} diverged"


def test_fuse_bit_identical_candidates():
    """Candidate-walk path (forced) + defocus draws, fuse 2."""
    w = World()
    w.set_camera(Transform.from_xyz(0.0, 1.2, 6.0).looking_at((0.0, 0.5, 0.0)))
    w.spawn_sphere(Transform.from_xyz(0.0, -1000.0, 0.0),
                   RaytracedSphere(1000.0),
                   StandardMaterial(base_color=(0.5, 0.5, 0.5)))
    rng = np.random.default_rng(7)
    for i in range(60):
        x, z = rng.uniform(-4, 4, 2)
        m = (StandardMaterial(base_color=tuple(rng.uniform(0.1, 0.9, 3)),
                              metallic=1.0, perceptual_roughness=0.2)
             if i % 3 == 0 else
             StandardMaterial(base_color=tuple(rng.uniform(0.1, 0.9, 3))))
        w.spawn_sphere(Transform.from_xyz(float(x), 0.3, float(z)),
                       RaytracedSphere(0.3), m)
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1.0)
    cfg = RenderConfig(width=128, height=128, samples_per_pixel=2, bounces=3,
                       level=3, pallas_intersect="candidates")
    base, segs0 = _render(cfg, scene, cam, 1, seed=4, chunk=3111)
    img, segs = _render(cfg, scene, cam, 2, seed=4, chunk=3112)
    assert segs == segs0
    assert np.array_equal(base, img)


def test_fuse_adaptive_spp_map():
    """Per-lane sample targets (adaptive extension) respect fused halves."""
    from bevyray_tpu.kernels.pallas.megakernel import (block_grid,
                                                       render_tiles,
                                                       shuffle_blocks)
    w = rtiow.material_test_scene()
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1.0)
    cfg = RenderConfig(width=128, height=128, samples_per_pixel=4, bounces=2,
                       level=3)
    r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=3121))
    pscene = r.prepare(scene)
    sl, slmeta, slattr = r.shortlists(pscene, cam)
    if sl is None:
        pytest.skip("phase split disabled for this shape")
    nbx, nby = block_grid(cfg)
    import jax.numpy as jnp
    ys = jnp.arange(128)[:, None]
    xs = jnp.arange(128)[None, :]
    spp_map = jnp.where((xs // 16 + ys // 16) % 2 == 0, 4, 1).astype(jnp.int32)
    spp_map = shuffle_blocks(spp_map.reshape(-1), cfg).astype(jnp.int32)
    assert spp_map.shape[0] == nbx * nby
    outs = {}
    for fuse in (1, 2):
        old = mk.PHASE_FUSE
        mk.PHASE_FUSE = fuse
        try:
            outs[fuse] = [np.asarray(x) for x in render_tiles(
                pscene, cam, cfg, jnp.uint32(9), sl=sl, slmeta=slmeta,
                slattr=slattr, spp_map=spp_map, normalize=False)]
        finally:
            mk.PHASE_FUSE = old
    for a, b in zip(outs[1], outs[2]):
        assert np.array_equal(a, b)


def test_st_layout_bit_identical():
    """Parked-state layout (round 4): the compact 11-field layout (no ST_W,
    no radiance planes — scene_has_emissive(scene) is False here) must be
    BIT-identical to the full 14-field has_emissive=True layout; both cuts
    are derivations, not approximations (megakernel._st_layout)."""
    from bevyray_tpu.engine.pallas_renderer import _jitted
    from bevyray_tpu.core.vec import Vec3
    import jax.numpy as jnp

    w = rtiow.material_test_scene()
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1.0)
    cfg = RenderConfig(width=128, height=128, samples_per_pixel=4, bounces=4,
                       level=3, sphere_chunk=3131)
    r = PallasRenderer(cfg)
    assert mk.scene_has_emissive(scene) is False
    f_compact = r.render(scene, cam, seed=13)      # computed flag: False
    assert r._has_emissive is False
    pscene = r.prepare(scene)
    sl, slmeta, slattr = r.shortlists(pscene, cam)
    f_full = _jitted(cfg, r.exact_rng, True)(      # forced 14-field layout
        pscene=pscene, cam=cam, frame_seed=jnp.uint32(13),
        raster_color=Vec3.splat(jnp.float32(1.0)),
        raster_depth=jnp.float32(0.0), sl=sl, slmeta=slmeta, slattr=slattr)
    assert np.array_equal(np.asarray(f_compact.image), np.asarray(f_full.image))
    assert float(f_compact.rays_traced) == float(f_full.rays_traced)


def test_emissive_scene_uses_full_layout_and_matches_oracle():
    """An emissive scene must select the radiance-parking layout and still
    match the oracle through the phase-split megakernel (exact RNG)."""
    from bevyray_tpu.testing.oracle import (oracle_inputs_from_world,
                                            render_oracle_fast)
    from tests.test_extensions import _emissive_scene

    world = _emissive_scene()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=64, height=64, samples_per_pixel=2, bounces=4,
                       level=3, sphere_chunk=3141)
    r = PallasRenderer(cfg, exact_rng=True)
    assert mk.scene_has_emissive(scene) is True
    got = np.asarray(r.render(scene, cam, seed=4).image)
    assert r._has_emissive is True
    centers, radii, mats, camera = oracle_inputs_from_world(world)
    want, _ = render_oracle_fast(centers, radii, mats, camera, 64, 64, 2, 4,
                                 3, 4)
    assert np.abs(got - want).mean() < 4e-3


def test_fuse_grid_padding_bit_identical():
    """Indivisible tile counts pad the grid (17 tiles -> 18 at fuse 2); the
    cropped result and segment count must match the unfused program exactly."""
    w = rtiow.material_test_scene()
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1088 / 64)
    cfg = RenderConfig(width=1088, height=64, samples_per_pixel=2, bounces=2,
                       level=3)
    base, segs0 = _render(cfg, scene, cam, 1, seed=21, chunk=3151)
    img, segs = _render(cfg, scene, cam, 2, seed=21, chunk=3152)
    assert segs == segs0
    assert np.array_equal(base, img)


def test_fuse8_bit_identical():
    """Round-5: auto opens fuse 8 for the dense low-spp regime
    (DENSEFUSE_AB_r05) — pin value-identity at an 8-block grid, incl. a
    padded variant (9 blocks -> 16 at fuse 8)."""
    w = rtiow.material_test_scene()
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=512 / 64)
    cfg = RenderConfig(width=512, height=64, samples_per_pixel=2, bounces=2,
                       level=3)
    base, segs0 = _render(cfg, scene, cam, 1, seed=22, chunk=3161)
    img, segs = _render(cfg, scene, cam, 8, seed=22, chunk=3162)
    assert segs == segs0
    assert np.array_equal(base, img)
    cam = w.camera_state(aspect=576 / 64)
    cfg = dataclasses.replace(cfg, width=576)
    base, segs0 = _render(cfg, scene, cam, 1, seed=23, chunk=3163)
    img, segs = _render(cfg, scene, cam, 8, seed=23, chunk=3164)
    assert segs == segs0
    assert np.array_equal(base, img)


def test_depth_in_a_arms():
    """DEPTH_IN_A (round 4): first-hit depth is final after bounce 0 (phase B
    restarts parked samples at b_lane = 1), so phase A can accumulate it for
    every active sample, dropping the ST_FD plane and the fd + per-half dsums
    while-carry entries. Colors and segment counts must be BIT-identical to
    the parked-depth arm; the depth SUM reorders (strict sample order), so
    depth agrees to f32-sum-order ulps only."""
    w = rtiow.material_test_scene()
    scene = w.extract(with_bvh=False)
    cam = w.camera_state(aspect=1.0)
    cfg = RenderConfig(width=128, height=128, samples_per_pixel=4, bounces=4,
                       level=3)
    old_fuse, old_depth = mk.PHASE_FUSE, mk.DEPTH_IN_A
    frames = {}
    try:
        mk.PHASE_FUSE = 2        # exercise the per-half dsum routing cut
        for arm, flag, chunk in (("parked", False, 3161), ("in_a", True, 3162)):
            mk.DEPTH_IN_A = flag
            r = PallasRenderer(dataclasses.replace(cfg, sphere_chunk=chunk))
            frames[arm] = r.render(scene, cam, seed=11)
    finally:
        mk.PHASE_FUSE, mk.DEPTH_IN_A = old_fuse, old_depth
    a, b = frames["parked"], frames["in_a"]
    assert np.array_equal(np.asarray(a.image), np.asarray(b.image))
    assert float(a.rays_traced) == float(b.rays_traced)
    da, db = np.asarray(a.rt_depth), np.asarray(b.rt_depth)
    assert np.allclose(da, db, rtol=1e-6, atol=1e-4)
