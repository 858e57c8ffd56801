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


def generate_rays(u, v, jitter_u, jitter_v, cam: CameraState, height: int):
    """Jittered perspective primary rays (raytrace.wgsl:139-156).

    ``jitter_u/v`` are uniforms in [0,1); the reference subtracts 0.5 and scales by
    one texel (wgsl:140-144). Note the reference derives *width* from
    ``window.height * aspect`` (wgsl:142) — reproduced as-is.

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
    return origin, direction
