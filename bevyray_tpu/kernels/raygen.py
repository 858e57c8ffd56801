"""Camera ray generation — batched twin of ``random_ray_from_uv`` (raytrace.wgsl:139-156).

The reference runs one fragment-shader thread per pixel; here the whole frame is a
flat SoA batch of rays, generated in one fused elementwise pass (VPU-friendly: no
gathers, no divergence).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import CameraState
from ..core.vec import Vec3


def pixel_uv(width: int, height: int):
    """Per-pixel texture coordinates, flattened row-major (pixel 0 = top-left).

    Matches the fullscreen-pass UV convention consumed at raytrace.wgsl:94: u right,
    v down, sampled at pixel centers.
    """
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    u = (xs.reshape(-1) + 0.5) / jnp.float32(width)
    v = (ys.reshape(-1) + 0.5) / jnp.float32(height)
    return u, v


def generate_rays(u, v, jitter_u, jitter_v, cam: CameraState, height: int,
                  lens_u=None, lens_v=None):
    """Jittered perspective primary rays (raytrace.wgsl:139-156).

    ``jitter_u/v`` are uniforms in [0,1); the reference subtracts 0.5 and scales by
    one texel (wgsl:140-144). Note the reference derives *width* from
    ``window.height * aspect`` (wgsl:142) — reproduced as-is.

    ``lens_u/v`` enable thin-lens defocus blur (extension beyond the reference):
    the origin is jittered on a disk of diameter ``cam.aperture`` and the ray is
    re-aimed at the pinhole ray's focal point at ``cam.focus_distance``. With
    aperture 0 the pinhole path is reproduced exactly.

    Returns (origin: Vec3, direction: Vec3 — normalized).
    """
    h = jnp.float32(height)
    w = h * cam.aspect
    delta_u = (jitter_u - 0.5) / w
    delta_v = (jitter_v - 0.5) / h

    ndc_x = (u * 2.0 - 1.0) + delta_u
    ndc_y = (1.0 - v * 2.0) + delta_v

    right = cam.direction.cross(cam.up)             # wgsl:149
    scale = jnp.tan(cam.fov * 0.5)                  # wgsl:151

    d = (cam.direction
         + right.scale(ndc_x * cam.aspect * scale)
         + cam.up.scale(ndc_y * scale))
    direction = d.normalize()

    origin = Vec3(
        jnp.broadcast_to(cam.position.x, direction.x.shape),
        jnp.broadcast_to(cam.position.y, direction.y.shape),
        jnp.broadcast_to(cam.position.z, direction.z.shape),
    )

    if lens_u is not None:
        # Uniform disk sample (r = R·sqrt(u), θ = 2πv), offset the origin on the
        # lens plane, re-aim at the focal point.
        lens_radius = cam.aperture * 0.5
        r = lens_radius * jnp.sqrt(lens_u)
        theta = (2.0 * jnp.pi) * lens_v
        lx = r * jnp.cos(theta)
        ly = r * jnp.sin(theta)
        focal = origin + direction.scale(cam.focus_distance)
        origin = origin + right.scale(lx) + cam.up.scale(ly)
        direction = (focal - origin).normalize()

    return origin, direction
