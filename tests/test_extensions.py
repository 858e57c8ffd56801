"""Extensions beyond the reference shading model (BASELINE config 4): emissive
materials, thin-lens defocus blur, cosine importance sampling. Each is validated
against the oracle (same slot contract) and for physical plausibility."""

import numpy as np
import pytest

from bevyray_tpu import (RenderConfig, Renderer, RaytracedCamera, RaytracedSphere,
                         Raytracing, StandardMaterial, Transform, rtiow)
from bevyray_tpu.scene.world import World
from bevyray_tpu.testing.oracle import oracle_inputs_from_world, render_oracle


def _emissive_scene():
    """A dark room: no sky contribution matters — one emissive sphere lights a
    diffuse one."""
    world = World()
    world.set_camera(Transform.from_xyz(0, 1, 6).looking_at((0, 1, 0)),
                     camera=RaytracedCamera(level=Raytracing.PURE))
    world.spawn_sphere(Transform.from_xyz(0, -1000, 0), RaytracedSphere(1000.0),
                       StandardMaterial(base_color=(0.6, 0.6, 0.6)))
    world.spawn_sphere(Transform.from_xyz(-1, 1, 0), RaytracedSphere(0.8),
                       StandardMaterial(base_color=(0.8, 0.3, 0.3)))
    world.spawn_sphere(Transform.from_xyz(1.5, 2.5, 0), RaytracedSphere(0.6),
                       StandardMaterial(base_color=(0, 0, 0),
                                        emissive=(4.0, 3.5, 3.0)))
    return world


def test_emissive_sphere_glows_and_matches_oracle():
    world = _emissive_scene()
    cfg = RenderConfig(width=40, height=40, samples_per_pixel=2, bounces=4, level=3)
    frame = Renderer(cfg).render(world.extract(with_bvh=False),
                                 world.camera_state(aspect=1.0), seed=4)
    got = np.asarray(frame.image)

    centers, radii, mats, camera = oracle_inputs_from_world(world)
    want, _ = render_oracle(centers, radii, mats, camera, 40, 40, 2, 4, 3, 4)
    err = np.abs(got - want)
    assert err.mean() < 4e-3, err.mean()

    # The emissive sphere (upper right) must be the brightest region.
    bright = got.reshape(-1, 3).sum(-1)
    ys, xs = np.mgrid[0:40, 0:40]
    emissive_region = ((xs > 22) & (xs < 34) & (ys > 6) & (ys < 20)).reshape(-1)
    assert bright[emissive_region].mean() > 1.5 * bright[~emissive_region].mean()


def test_emissive_zero_is_bit_identical_to_base():
    """emissive=(0,0,0) must reproduce the radiance-free formulation exactly."""
    world = rtiow.material_test_scene()
    cfg = RenderConfig(width=24, height=24, samples_per_pixel=2, bounces=4, level=3)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    a = np.asarray(Renderer(cfg).render(scene, cam, seed=7).image)
    centers, radii, mats, camera = oracle_inputs_from_world(world)
    want, _ = render_oracle(centers, radii, mats, camera, 24, 24, 2, 4, 3, 7)
    assert np.abs(a - want).mean() < 2e-3


def test_defocus_blur_blurs_offfocus_only():
    world = rtiow.material_test_scene()
    world.camera.aperture = 1.2   # wide-open lens → strong blur off focus
    # Focus very near so all scene geometry sits well off the focal plane.
    world.camera.focus_distance = 1.5
    w = h = 64
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)

    sharp_cfg = RenderConfig(width=w, height=h, samples_per_pixel=16, bounces=3,
                             level=3)
    blur_cfg = RenderConfig(width=w, height=h, samples_per_pixel=16, bounces=3,
                            level=3, defocus=True)
    sharp = np.asarray(Renderer(sharp_cfg).render(scene, cam, seed=2).image)
    blur = np.asarray(Renderer(blur_cfg).render(scene, cam, seed=2).image)

    def edge_energy(img):
        # 4×4 box filter first so Monte-Carlo grain doesn't dominate the metric.
        k = 4
        h2, w2 = img.shape[0] // k, img.shape[1] // k
        sm = img[:h2 * k, :w2 * k].reshape(h2, k, w2, k, 3).mean((1, 3))
        return np.abs(np.diff(sm, axis=1)).mean()

    # Silhouettes off the focal plane must soften overall.
    assert edge_energy(blur) < 0.95 * edge_energy(sharp)

    # Matches the oracle with the same lens model.
    centers, radii, mats, camera = oracle_inputs_from_world(world)
    want, _ = render_oracle(centers, radii, mats, camera, w, h, 4, 3, 3, 2,
                            defocus=True)
    got = np.asarray(Renderer(RenderConfig(width=w, height=h, samples_per_pixel=4,
                                           bounces=3, level=3, defocus=True))
                     .render(scene, cam, seed=2).image)
    assert np.abs(got - want).mean() < 4e-3


def test_cosine_sampling_converges_to_reference_mean():
    """Cosine importance sampling is a different estimator of the same integral:
    for roughness-0 Lambertian surfaces the high-spp means must agree."""
    world = World()
    world.set_camera(Transform.from_xyz(0, 1, 5).looking_at((0, 1, 0)),
                     camera=RaytracedCamera(level=Raytracing.PURE))
    world.spawn_sphere(Transform.from_xyz(0, -1000, 0), RaytracedSphere(1000.0),
                       StandardMaterial(base_color=(0.5, 0.5, 0.5),
                                        perceptual_roughness=0.0))
    world.spawn_sphere(Transform.from_xyz(0, 1, 0), RaytracedSphere(1.0),
                       StandardMaterial(base_color=(0.7, 0.2, 0.2),
                                        perceptual_roughness=0.0))
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    kw = dict(width=24, height=24, samples_per_pixel=96, bounces=6, level=3)
    ref = np.asarray(Renderer(RenderConfig(**kw)).render(scene, cam, seed=1).image)
    cos = np.asarray(Renderer(RenderConfig(**kw, diffuse_sampling="cosine"))
                     .render(scene, cam, seed=2).image)
    assert abs(ref.mean() - cos.mean()) < 0.015
    assert np.abs(ref - cos).mean() < 0.05
