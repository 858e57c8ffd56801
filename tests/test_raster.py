"""Analytic raster layer: depth convention, hybrid end-to-end from the public
API (the reference generates these buffers with a real rasterizer + depth
prepass: main.rs:75-85, mod.rs:107-115, raytrace.wgsl:104-120)."""

import numpy as np

from bevyray_tpu import RenderConfig, Renderer, rtiow
from bevyray_tpu.engine.raster import raster_layer
from bevyray_tpu.scene.components import (RaytracedSphere, StandardMaterial,
                                          Transform, cube_mesh)
from bevyray_tpu.scene.world import World
from bevyray_tpu.testing.oracle import oracle_inputs_from_world, render_oracle


def _cube_world():
    world = World()
    world.set_camera(Transform.from_xyz(0.0, 1.0, 4.0).looking_at((0.0, 0.5, 0.0)))
    world.spawn_sphere(Transform.from_xyz(0.0, -1000.0, 0.0),
                       RaytracedSphere(1000.0),
                       StandardMaterial(base_color=(0.5, 0.5, 0.5)))
    world.spawn_sphere(Transform.from_xyz(-1.2, 0.5, 0.0), RaytracedSphere(0.5),
                       StandardMaterial(base_color=(0.1, 0.2, 0.5)))
    world.spawn_raster_mesh(Transform.from_xyz(0.0, 0.5, 0.0), cube_mesh(1.0),
                            StandardMaterial(base_color=(0.8, 0.7, 0.6)))
    return world


def test_depth_convention():
    """Raster depth is reverse-Z ``near / view_z``: 0 where nothing rasterizes,
    in (0, near/dist] on the cube, increasing for closer surfaces."""
    world = _cube_world()
    cfg = RenderConfig(width=64, height=64, samples_per_pixel=1, bounces=1,
                       level=1)
    cam = world.camera_state(aspect=1.0)
    color, depth = raster_layer(world, cam, cfg)
    d = np.asarray(depth).reshape(64, 64)
    hit = d > 0
    assert hit.any() and not hit.all()
    # camera is ~3.6 units from the cube's near face; near=0.1
    assert d[hit].max() <= 0.1 / 2.5
    assert d[hit].min() >= 0.1 / 10.0
    c = np.asarray(color.x).reshape(64, 64)
    assert (c[~hit] == 1.0).all()          # clear color (white, main.rs:60)


def test_no_raster_entities_returns_none():
    world = World()
    world.spawn_sphere(Transform.from_xyz(0, 0, 0), RaytracedSphere(1.0),
                       StandardMaterial())
    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1, bounces=1, level=1)
    assert raster_layer(world, world.camera_state(aspect=1.0), cfg) == (None, None)


def test_hybrid_level1_golden_vs_oracle():
    """Level-1 render with the analytic raster cube matches the scalar oracle fed
    the SAME buffers — pins the full blend path (near/t vs prepass reverse-Z,
    mode-1 fallback far), the VERDICT-requested end-to-end hybrid golden."""
    world = _cube_world()
    W = H = 32
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, bounces=3, level=1)
    cam = world.camera_state(aspect=1.0)
    rc, rd = raster_layer(world, cam, cfg)

    got = np.asarray(Renderer(cfg).render(world.extract(with_bvh=False), cam,
                                          seed=5, raster_color=rc,
                                          raster_depth=rd).image)

    centers, radii, mats, camera = oracle_inputs_from_world(world)
    raster_color = np.stack([np.asarray(v).reshape(H, W) for v in
                             (rc.x, rc.y, rc.z)], axis=-1)
    raster_depth = np.asarray(rd).reshape(H, W)
    want, _ = render_oracle(centers, radii, mats, camera, W, H,
                            samples_per_pixel=2, bounces=3, level=1,
                            frame_seed=5, raster_color=raster_color,
                            raster_depth=raster_depth)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_cube_wins_where_nearer():
    """Where the cube's reverse-Z depth beats the raytraced depth, the image is
    exactly the raster color; level 3 ignores the raster layer entirely."""
    world = _cube_world()
    cfg1 = RenderConfig(width=48, height=48, samples_per_pixel=2, bounces=3,
                        level=1)
    cam = world.camera_state(aspect=1.0)
    rc, rd = raster_layer(world, cam, cfg1)
    scene = world.extract(with_bvh=False)
    f1 = Renderer(cfg1).render(scene, cam, seed=3, raster_color=rc,
                               raster_depth=rd)
    img = np.asarray(f1.image)
    rdm = np.asarray(rd).reshape(48, 48)
    rz = np.where(np.asarray(f1.rt_depth) > float(np.asarray(cam.far)), -1.0,
                  float(np.asarray(cam.near)) / np.asarray(f1.rt_depth))
    wins = rdm > rz
    assert wins.any()
    for ch, comp in zip(range(3), (rc.x, rc.y, rc.z)):
        np.testing.assert_array_equal(img[..., ch][wins],
                                      np.asarray(comp).reshape(48, 48)[wins])

    import dataclasses
    cfg3 = dataclasses.replace(cfg1, level=3)
    f3 = Renderer(cfg3).render(scene, cam, seed=3, raster_color=rc,
                               raster_depth=rd)
    assert np.abs(np.asarray(f3.image) - img).max() > 0.05


def test_sharded_frame_accepts_raster_buffers():
    """Per-pixel raster buffers flow through the SPMD frame step (composite
    happens outside shard_map, partitioned by XLA) and match the unsharded
    renderer exactly."""
    from bevyray_tpu.parallel.sharding import make_mesh, render_frame_sharded

    world = _cube_world()
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=2, bounces=3,
                       level=1)
    cam = world.camera_state(aspect=1.0)
    rc, rd = raster_layer(world, cam, cfg)
    scene = world.extract(with_bvh=False)

    want = np.asarray(Renderer(cfg).render(scene, cam, seed=5, raster_color=rc,
                                           raster_depth=rd).image)
    mesh = make_mesh(2, 2, 2)
    got = np.asarray(render_frame_sharded(mesh, scene, cam, cfg, frame_seed=5,
                                          raster_color=rc,
                                          raster_depth=rd).image)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_final_scene_has_the_cube():
    world = rtiow.final_scene(seed=42, grid=2)
    assert world.n_raster == 1
    data = world.extract_raster_host()
    assert data[0].shape == (12, 3)   # 12 triangles


def test_ambient_only_shading_golden():
    """The reference app spawns NO lights (main.rs:49-240), so Bevy shades its
    cube with the default ambient only. Pin the full convention (round 4):
    Bevy 0.14 ``ambient_light`` — split-sum EnvBRDFApprox diffuse + specular
    with F_AB, Filament pre-baked specular occlusion, white 80-lux ambient ×
    default exposure 1/(125·1.2) — evaluated here INDEPENDENTLY per pixel
    (numpy slab-test of the axis-aligned cube + the scalar F_AB formula)."""
    import jax.numpy as jnp

    from bevyray_tpu.kernels.raygen import generate_rays, pixel_uv
    from bevyray_tpu.scene.components import srgb_to_linear

    world = _cube_world()
    W = H = 64
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=1, bounces=1,
                       level=1)
    cam = world.camera_state(aspect=1.0)
    color, depth = raster_layer(world, cam, cfg)
    hit = np.asarray(depth) > 0
    assert hit.any()

    # Independent center rays (generate_rays is pinned elsewhere) + exact
    # axis-aligned slab test of the unit cube at (0, 0.5, 0).
    u, v = pixel_uv(W, H)
    half = jnp.full_like(u, 0.5)
    o, d = generate_rays(u, v, half, half, cam, H)
    o = np.stack([np.asarray(c) for c in (o.x, o.y, o.z)], -1).astype(np.float64)
    d = np.stack([np.asarray(c) for c in (d.x, d.y, d.z)], -1).astype(np.float64)
    lo, hi = np.array([-0.5, 0.0, -0.5]), np.array([0.5, 1.0, 0.5])
    t1, t2 = (lo - o) / d, (hi - o) / d
    t_near = np.minimum(t1, t2).max(-1)
    t_far = np.maximum(t1, t2).min(-1)
    box_hit = (t_far >= t_near) & (t_far > 0)
    np.testing.assert_array_equal(box_hit, hit)   # same silhouette
    # Entry face normal: the axis achieving t_near, sign opposing the ray.
    ax = np.argmax(np.minimum(t1, t2), axis=-1)
    n = np.zeros_like(d)
    n[np.arange(n.shape[0]), ax] = -np.sign(d[np.arange(d.shape[0]), ax])
    no_v = np.maximum(np.abs((n * d).sum(-1)), 1e-4)

    def f_ab(rough, nov):
        r = rough * np.array([-1.0, -0.0275, -0.572, 0.022]) + np.array(
            [1.0, 0.0425, 1.04, -0.04])
        a004 = np.minimum(r[0] * r[0], np.exp2(-9.28 * nov)) * r[0] + r[1]
        return -1.04 * a004 + r[2], 1.04 * a004 + r[3]

    base = np.array([srgb_to_linear(c) for c in (0.8, 0.7, 0.6)])
    f0 = 0.16 * 0.5 ** 2                     # metallic 0, reflectance 0.5
    ds, db = f_ab(1.0, no_v)
    ss, sb = f_ab(0.5, no_v)                 # default perceptual_roughness
    spec_occ = np.clip(3 * f0 * 50.0 * 0.33, 0.0, 1.0)
    ambient = 80.0 / (125.0 * 1.2)
    want = ((base[None, :] * ds[:, None] + db[:, None])
            + ((f0 * ss + sb) * spec_occ)[:, None]) * ambient
    got = np.stack([np.asarray(c) for c in (color.x, color.y, color.z)], -1)
    np.testing.assert_allclose(got[hit], want[hit], rtol=2e-4)

    # Metallic kills the diffuse term and recolors F0 = base: a fully-metallic
    # cube shades as pure F0-specular ambient (Bevy: metals still reflect the
    # environment — brighter than intuition suggests, dimmer than dielectric
    # diffuse only for dark base colors).
    world2 = World()
    world2.set_camera(Transform.from_xyz(0.0, 1.0, 4.0).looking_at((0.0, 0.5, 0.0)))
    world2.spawn_raster_mesh(Transform.from_xyz(0.0, 0.5, 0.0), cube_mesh(1.0),
                             StandardMaterial(base_color=(0.8, 0.7, 0.6),
                                              metallic=1.0))
    c2, d2 = raster_layer(world2, world2.camera_state(aspect=1.0), cfg)
    hit2 = np.asarray(d2) > 0
    dsm, dbm = f_ab(1.0, no_v)               # diffuse term: F0-colored bias only
    want_metal = ((0.0 * dsm + dbm)[:, None]
                  + (base[None, :] * ss[:, None] + sb[:, None])
                  * np.clip(base.sum() * 50.0 * 0.33, 0.0, 1.0)) * ambient
    got2 = np.stack([np.asarray(c) for c in (c2.x, c2.y, c2.z)], -1)
    np.testing.assert_allclose(got2[hit2], want_metal[hit2], rtol=2e-4)


def test_transform_rotation_roundtrip():
    """Quaternion rotation on mesh entities: axis-angle → matrix → apply is
    length-preserving and inverts exactly; the identity takes the bit-exact
    add-only path."""
    t = Transform.from_xyz(1.0, 2.0, 3.0).with_rotation(
        Transform.rotation_axis_angle((0.0, 1.0, 0.0), np.pi / 3))
    pts = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.3, -0.2, 0.7]],
                   np.float32)
    out = t.apply_points(pts)
    # Rotation preserves distances from the translation point.
    np.testing.assert_allclose(
        np.linalg.norm(out - np.array(t.translation, np.float32), axis=1),
        np.linalg.norm(pts, axis=1), rtol=1e-6)
    # Inverse rotation recovers the object-space points.
    r = t.rotation_matrix()
    back = (out - np.array(t.translation, np.float32)) @ np.asarray(
        r, np.float32)   # R⁻¹ = Rᵀ; right-multiply by R == apply Rᵀ
    np.testing.assert_allclose(back, pts, atol=1e-6)

    # Identity rotation: bit-identical to pure translation.
    ti = Transform.from_xyz(1.0, 2.0, 3.0)
    np.testing.assert_array_equal(
        ti.apply_points(pts), pts + np.array([1, 2, 3], np.float32))

    # with_rotation normalizes.
    tn = Transform().with_rotation((0.0, 2.0, 0.0, 0.0))
    assert np.isclose(np.linalg.norm(tn.rotation), 1.0)


def test_rotated_raster_cube_changes_silhouette():
    """A 45°-about-Y cube shows a wider silhouette than the axis-aligned one,
    and the traced-mesh extractor applies the same rotation."""
    def cube_world(rot):
        w = World()
        w.set_camera(Transform.from_xyz(0.0, 0.5, 4.0).looking_at((0.0, 0.5, 0.0)))
        t = Transform.from_xyz(0.0, 0.5, 0.0)
        if rot is not None:
            t = t.with_rotation(rot)
        w.spawn_raster_mesh(t, cube_mesh(1.0), StandardMaterial())
        return w

    cfg = RenderConfig(width=64, height=64, samples_per_pixel=1, bounces=1,
                       level=1)
    q = Transform.rotation_axis_angle((0.0, 1.0, 0.0), np.pi / 4)
    _, d0 = raster_layer(cube_world(None), cube_world(None).camera_state(1.0), cfg)
    _, d1 = raster_layer(cube_world(q), cube_world(q).camera_state(1.0), cfg)
    cover0 = (np.asarray(d0) > 0).mean()
    cover1 = (np.asarray(d1) > 0).mean()
    assert cover1 > cover0 * 1.05   # diagonal spans √2 of the face width

    # Traced meshes rotate identically (same extractor path).
    wt = World()
    wt.spawn_mesh(Transform.from_xyz(0.0, 0.5, 0.0).with_rotation(q),
                  cube_mesh(1.0), StandardMaterial())
    va, vb, vc, _, _ = wt.extract_meshes_host(first_material_id=0)
    corners = np.concatenate([va, vb, vc])
    assert np.isclose(np.abs(corners[:, 0]).max(), np.sqrt(2) / 2, atol=1e-5)
