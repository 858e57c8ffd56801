"""Hybrid raster+raytraced compositing with a supplied G-buffer (BASELINE config 5
lite): the reference blends against Bevy's rasterizer output + depth prepass
(raytrace.wgsl:104-120); here the raster layer arrives as explicit color/depth
arrays, reproducing the same reverse-Z comparison."""

import jax.numpy as jnp
import numpy as np

from bevyray_tpu import RenderConfig, Renderer, rtiow
from bevyray_tpu.core.vec import Vec3


def _mk_raster(world, width, height, box_depth_t):
    """A fake rasterized layer: a magenta 'cube' filling the center of the frame
    at view distance box_depth_t, over a white clear color at the far plane."""
    n = width * height
    ys, xs = np.mgrid[0:height, 0:width]
    in_box = ((np.abs(xs - width / 2) < width / 6)
              & (np.abs(ys - height * 0.6) < height / 6)).reshape(-1)
    color = np.where(in_box[:, None], np.array([[1.0, 0.0, 1.0]], np.float32),
                     np.ones((1, 3), np.float32))
    near = world.projection.near
    depth = np.where(in_box, np.float32(near / box_depth_t), np.float32(0.0))
    rc = Vec3(jnp.asarray(color[:, 0]), jnp.asarray(color[:, 1]),
              jnp.asarray(color[:, 2]))
    return rc, jnp.asarray(depth), in_box


def test_raster_box_occludes_and_is_occluded():
    """A raster box nearer than the spheres must win; spheres nearer than the
    box must win — the depth comparison, both ways."""
    world = rtiow.material_test_scene()
    w = h = 48
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=2, bounces=4, level=2)
    r = Renderer(cfg)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)

    # Case 1: box very close (t=0.5) — in front of everything raytraced.
    rc, rd, in_box = _mk_raster(world, w, h, box_depth_t=0.5)
    img = np.asarray(r.render(scene, cam, seed=3, raster_color=rc,
                              raster_depth=rd).image)
    box_px = img.reshape(-1, 3)[in_box]
    assert (np.abs(box_px - [1.0, 0.0, 1.0]) < 1e-5).all(), "near box must win"

    # Case 2: box very far (t=900) — spheres (t≈3.5) must cover it where hit.
    rc, rd, in_box = _mk_raster(world, w, h, box_depth_t=900.0)
    frame = r.render(scene, cam, seed=3, raster_color=rc, raster_depth=rd)
    img2 = np.asarray(frame.image)
    depth2 = np.asarray(frame.rt_depth).reshape(-1)
    hit_and_box = in_box & (depth2 < 10.0)
    assert hit_and_box.sum() > 20
    boxed = img2.reshape(-1, 3)[hit_and_box]
    assert not (np.abs(boxed - [1.0, 0.0, 1.0]) < 1e-5).all(axis=1).any(), \
        "spheres in front of the far box must not show the box"


def test_level1_vs_level2_sky_vs_raster_background():
    """The only difference between levels 1 and 2 is who wins at infinity
    (wgsl:177-182): level 1 raster background, level 2 raytraced sky."""
    world = rtiow.material_test_scene()
    w = h = 32
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    rc = Vec3.splat(jnp.float32(0.25))   # grey raster background
    rd = jnp.float32(0.0)

    img1 = np.asarray(Renderer(RenderConfig(width=w, height=h, samples_per_pixel=1,
                                            bounces=2, level=1))
                      .render(scene, cam, seed=1, raster_color=rc,
                              raster_depth=rd).image)
    img2 = np.asarray(Renderer(RenderConfig(width=w, height=h, samples_per_pixel=1,
                                            bounces=2, level=2))
                      .render(scene, cam, seed=1, raster_color=rc,
                              raster_depth=rd).image)
    # Top rows are sky: level 1 shows the grey raster, level 2 the blue gradient.
    np.testing.assert_allclose(img1[:4], 0.25, atol=1e-6)
    assert (img2[:4, :, 2] > 0.9).all()
    # Where geometry exists (bottom half), both levels agree.
    np.testing.assert_allclose(img1[-8:], img2[-8:], atol=1e-6)


def test_raster_ambient_matches_bevy_formula():
    """The analytic raster layer's shading must equal Bevy 0.14's
    ``ambient_light`` (split-sum EnvBRDFApprox, Filament specular occlusion,
    80-lux white ambient x default exposure) — hand-evaluated here at normal
    incidence for the default cube material (round-3 VERDICT item 6)."""
    from bevyray_tpu import (RaytracedCamera, Raytracing, StandardMaterial,
                             Transform, cube_mesh)
    from bevyray_tpu.engine.raster import raster_layer
    from bevyray_tpu.scene.components import srgb_to_linear
    from bevyray_tpu.scene.world import World

    w = h = 17   # odd: the center pixel ray runs exactly along cam.direction
    world = World()
    world.set_camera(Transform.from_xyz(0, 0, 4).looking_at((0, 0, 0)),
                     camera=RaytracedCamera(level=Raytracing.FALLBACK_RASTER))
    mat = StandardMaterial(base_color=(0.8, 0.3, 0.2))
    world.spawn_raster_mesh(Transform.from_xyz(0, 0, 0), cube_mesh(1.0), mat)
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=1, bounces=1,
                       level=2)
    rc, rd = raster_layer(world, world.camera_state(aspect=1.0), cfg)
    center = (h // 2) * w + (w // 2)
    got = np.array([np.asarray(v)[center] for v in (rc.x, rc.y, rc.z)])

    # Hand evaluation, NoV = 1: F_AB(1,1) = (0.4524, -0.0024);
    # F_AB(0.5,1): a004 = min(0.25, 2**-9.28)*0.5 + 0.02875.
    base = np.array([srgb_to_linear(c) for c in (0.8, 0.3, 0.2)])
    f0 = 0.16 * 0.5**2          # metallic 0, reflectance 0.5
    d_scale, d_bias = 0.468 - 1.04 * 0.015, 1.04 * 0.015 - 0.018
    a004 = min(0.25, 2.0 ** -9.28) * 0.5 + 0.02875
    s_scale, s_bias = 0.754 - 1.04 * a004, 1.04 * a004 - 0.029
    spec_occ = min(1.0, 3 * f0 * 50.0 * 0.33)
    ambient = 80.0 / (125.0 * 1.2)
    want = (base * d_scale + d_bias
            + (f0 * s_scale + s_bias) * spec_occ) * ambient
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # And the depth buffer holds reverse-Z near/view_z for the front face.
    near = world.projection.near
    np.testing.assert_allclose(np.asarray(rd)[center], near / 3.5, rtol=1e-4)
