"""TPU: 5000-sphere stress scene — phase-split × walk matrix at 640x360/4spp.

Records whether the coherent bounce-0 shortlist pass composes with the
candidate walk at scale (shortlists cover bounce 0; candidates own bounces 1+).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


def make_world(n=5000, seed=2):
    from bevyray_tpu import (RaytracedCamera, RaytracedSphere, Raytracing,
                             StandardMaterial, Transform)
    from bevyray_tpu.scene.world import World

    rng = np.random.RandomState(seed)
    world = World()
    world.set_camera(Transform.from_xyz(0, 4, 18).looking_at((0, 0, 0)),
                     camera=RaytracedCamera(level=Raytracing.PURE))
    world.spawn_sphere(Transform.from_xyz(0, -1000, 0), RaytracedSphere(1000.0),
                       StandardMaterial(base_color=(0.5, 0.5, 0.5)))
    for _ in range(n):
        p = rng.uniform(-14, 14, 3)
        p[1] = rng.uniform(0.2, 3.0)
        world.spawn_sphere(Transform.from_xyz(*p),
                           RaytracedSphere(float(rng.uniform(0.1, 0.4))),
                           StandardMaterial(base_color=tuple(rng.rand(3))))
    return world


def main():
    from bevyray_tpu import RenderConfig
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer

    W, H = 640, 384
    world = make_world()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=W / H)

    def sync(f):
        return np.asarray(f.image[0, 0])

    for walk in ("candidates", "grouped"):
        for primary in ("split", "off"):
            cfg = RenderConfig(width=W, height=H, samples_per_pixel=4,
                               bounces=4, level=3, pallas_intersect=walk,
                               pallas_primary=primary)
            r = PallasRenderer(cfg)
            sync(r.render(scene, cam, seed=0))
            times, rays = [], []
            for i in range(5):
                t0 = time.perf_counter()
                f = r.render(scene, cam, seed=i + 1)
                sync(f)
                times.append(time.perf_counter() - t0)
                rays.append(float(f.rays_traced))
            p50 = float(np.percentile(times, 50))
            print(json.dumps({"walk": walk, "primary": primary,
                              "p50_ms": round(p50 * 1e3, 1),
                              "mrays": round(np.mean(rays) / p50 / 1e6, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
