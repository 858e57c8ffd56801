"""Sky light and hybrid depth compositing.

``background_gradient`` twins raytrace.wgsl:364-369; ``composite`` twins the mode
dispatch in ``fragment`` (raytrace.wgsl:97-122) including the reverse-Z depth
comparison against a rasterized depth buffer.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import Vec3


def background_gradient(direction: Vec3) -> Vec3:
    """RTiOW sky: lerp(white → (0.5, 0.7, 1.0)) on the unit direction's y."""
    unit = direction.normalize()
    a = 0.5 * (unit.y + 1.0)
    return Vec3(1.0 - a + a * 0.5, 1.0 - a + a * 0.7, 1.0 - a + a * 1.0)


def linear_to_gamma(color: Vec3) -> Vec3:
    """sqrt "gamma" (raytrace.wgsl:226-228)."""
    return Vec3(jnp.sqrt(jnp.maximum(color.x, 0.0)),
                jnp.sqrt(jnp.maximum(color.y, 0.0)),
                jnp.sqrt(jnp.maximum(color.z, 0.0)))


def composite(level: int, rt_color: Vec3, rt_depth: jnp.ndarray,
              near, far, raster_color: Vec3, raster_depth: jnp.ndarray) -> Vec3:
    """Mode dispatch (raytrace.wgsl:97-122). ``level`` is static.

    ``raster_depth`` is reverse-Z like Bevy's depth prepass: 0 at far, 1 at near
    (wgsl:105-106). Raytraced distance t is converted to reverse-Z via ``near / t``,
    with anything beyond ``far`` mapped to -1 so raster always wins there
    (wgsl:108-113).
    """
    if level == 0:   # Skip
        return raster_color
    if level == 3:   # Pure
        return rt_color
    rz = jnp.where(rt_depth > far, -1.0, near / rt_depth)
    use_raster = raster_depth > rz
    return Vec3.where(use_raster, raster_color, rt_color)
