"""Multi-view rendering (reference ViewNodeRunner analog, SURVEY.md C9)."""

import numpy as np

from bevyray_tpu import RenderConfig, rtiow
from bevyray_tpu.engine.views import View, ViewSet
from bevyray_tpu.scene.components import Transform


def test_two_views_share_scene_and_differ_by_camera():
    world = rtiow.material_test_scene()
    scene = world.extract(with_bvh=False)

    cfg = RenderConfig(width=24, height=24, samples_per_pixel=2, bounces=3, level=3)
    front = world.camera_state(aspect=1.0)
    world.set_camera(Transform.from_xyz(4.0, 1.0, 0.0).looking_at((0, 0.5, 0)))
    side = world.camera_state(aspect=1.0)

    vs = ViewSet([View("front", cfg, front), View("side", cfg, side)])
    frames = vs.render_all(scene, seed=5)
    assert [n for n, _ in frames] == ["front", "side"]
    a = np.asarray(frames[0][1].image)
    b = np.asarray(frames[1][1].image)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).mean() > 0.01   # genuinely different viewpoints
    # Renderers are shared per config.
    assert len(vs._renderers) == 1
