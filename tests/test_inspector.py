"""Picking + inspection (the reference's editor-tooling analogs, SURVEY.md C14)."""

import numpy as np

from bevyray_tpu import RenderConfig, Renderer, rtiow
from bevyray_tpu.app.inspector import describe, pick
from bevyray_tpu.engine.film import ProgressiveRenderer, load_film, save_film
from bevyray_tpu.scene.components import RaytracedSphere, StandardMaterial, Transform
from bevyray_tpu.scene.world import World


def test_pick_center_sphere():
    world = rtiow.material_test_scene()
    # Center pixel looks at the blue sphere at (0, 0.5, 0) — entity 1.
    eid = pick(world, px=64, py=64, width=128, height=128)
    assert eid == 1


def test_pick_sky_returns_none():
    world = rtiow.material_test_scene()
    eid = pick(world, px=64, py=1, width=128, height=128)   # top edge = sky
    assert eid is None


def test_pick_respects_despawn():
    world = World()
    a = world.spawn_sphere(Transform.from_xyz(0, 0, -5), RaytracedSphere(1.0),
                           StandardMaterial())
    b = world.spawn_sphere(Transform.from_xyz(0, 0, -10), RaytracedSphere(1.0),
                           StandardMaterial())
    assert pick(world, 16, 16, 32, 32) == a
    world.despawn(a)
    assert pick(world, 16, 16, 32, 32) == b


def test_describe_lists_entities():
    world = rtiow.simple_scene()
    text = describe(world)
    assert "4 live spheres" in text
    assert "diffuse" in text and "Camera:" in text


def test_film_checkpoint_roundtrip(tmp_path):
    world = rtiow.simple_scene()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=2, bounces=2, level=3)

    prog = ProgressiveRenderer(cfg)
    prog.step(scene, cam, seed=1)
    path = str(tmp_path / "film.npz")
    prog.save(path)

    resumed = ProgressiveRenderer(cfg)
    resumed.load(path, cam)
    assert resumed.samples_accumulated == 2
    a = resumed.step(scene, cam, seed=1)

    straight = ProgressiveRenderer(cfg)
    straight.step(scene, cam, seed=1)
    b = straight.step(scene, cam, seed=1)
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image), atol=1e-6)
