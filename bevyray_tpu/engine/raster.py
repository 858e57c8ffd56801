"""Analytic raster layer — generates the color/reverse-Z-depth inputs the hybrid
modes blend against, from raster-only entities in a ``World``.

The reference gets these buffers from Bevy's real rasterizer: the scene's one
visible entity is a cube (main.rs:76-85), the plugin auto-adds a ``DepthPrepass``
to every camera (mod.rs:34,108-115), and the shader samples screen texture +
prepass depth for the blend (raytrace.wgsl:101-106). This rebuild has no GPU
raster pipeline, so the same buffers are produced analytically: one center ray
per pixel against the raster triangle set (a "rasterizer" with exactly the
samples the blend needs), depth in Bevy's reverse-Z convention
``near / view_z`` — the quantity the prepass texture holds and the one
``kernels.composite`` compares ``near / t`` against (raytrace.wgsl:105-113).

Shading matches what Bevy actually shows for this app: the reference spawns NO
light entities (main.rs:49-240 contains zero lights), so Bevy's PBR pass shades
the cube with the default ambient light only. Bevy 0.14 defaults
(Cargo.toml:7): ``AmbientLight::default()`` = white at 80 lux, and the default
camera exposure is ``1 / (2^ev100 · 1.2)`` with ev100 = log2(f²/shutter ·
100/ISO) = log2(1²·125) for the physical defaults (f/1.0, 1/125 s, ISO 100) —
so the flat ambient factor is 80 / (125 · 1.2) = 0.5333. Bevy's diffuse
ambient term multiplies base_color · (1 − metallic); its additional
environment-specular F_ab term and occlusion are out of scope (documented
divergence — they are small for the shipped cube: dielectric, roughness 0.5).
The blend logic consuming these buffers is the faithful part (pinned against
the oracle). Clear color defaults to WHITE like the reference camera
(main.rs:60).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import INF
from ..core.types import CameraState, RenderConfig, Triangles, make_triangles_np
from ..core.vec import Vec3
from ..kernels.intersect import intersect_triangles
from ..kernels.raygen import generate_rays, pixel_uv

# Bevy 0.14 default ambient-only shading (no lights spawned in the reference):
# AmbientLight brightness 80 lux × default exposure 1/(125·1.2).
_AMBIENT_LUX = 80.0
_EXPOSURE = 1.0 / (125.0 * 1.2)
_AMBIENT = np.float32(_AMBIENT_LUX * _EXPOSURE)   # 0.5333…


def rasterize_impl(tris: Triangles, tri_colors: jnp.ndarray, cam: CameraState,
                   config: RenderConfig, clear_color: Tuple[float, float, float]):
    """(raster_color: Vec3 [N], raster_depth [N]) for the frame.

    One un-jittered center ray per pixel (the raster sample grid); nearest
    triangle wins; depth = ``near / view_z`` (reverse-Z, 0 = clear/far).
    ``tri_colors``: [T, 4] linear per-triangle base color + metallic.
    """
    u, v = pixel_uv(config.width, config.height)
    half = jnp.full_like(u, 0.5)          # (j - 0.5)/w == 0 → exact pixel center
    origin, direction = generate_rays(u, v, half, half, cam, config.height)

    t, idx = intersect_triangles(origin, direction, tris)
    hit = t < INF   # miss sentinel is f32::MAX (core.constants), not jnp.inf
    safe_idx = jnp.clip(idx, 0, tris.capacity - 1)
    safe_t = jnp.where(hit, t, 1.0)

    # Bevy-default ambient-only shading (no lights in the reference scene):
    # flat diffuse ambient = base_color · (1 − metallic) · ambient·exposure.
    shade = _AMBIENT * (1.0 - tri_colors[safe_idx, 3])

    base = Vec3(tri_colors[safe_idx, 0], tri_colors[safe_idx, 1],
                tri_colors[safe_idx, 2])
    cr, cg, cb = (jnp.float32(x) for x in clear_color)
    color = Vec3(jnp.where(hit, base.x * shade, cr),
                 jnp.where(hit, base.y * shade, cg),
                 jnp.where(hit, base.z * shade, cb))

    # Bevy depth prepass stores reverse-Z NDC depth = near / view_z; view_z is
    # the hit's forward distance (t scaled by the ray·forward cosine). Misses
    # keep the clear depth 0.0 (= infinitely far), so raster never wins there.
    view_z = safe_t * direction.dot(cam.direction)
    depth = jnp.where(hit, cam.near / jnp.maximum(view_z, 1e-20), 0.0)
    return color, depth


@functools.lru_cache(maxsize=16)
def _jitted_rasterize(config: RenderConfig, clear_color):
    return jax.jit(functools.partial(rasterize_impl, config=config,
                                     clear_color=clear_color))


def raster_layer(world, cam: CameraState, config: RenderConfig,
                 clear_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
                 ) -> Tuple[Optional[Vec3], Optional[jnp.ndarray]]:
    """Raster buffers for a world, or ``(None, None)`` when it has no raster
    entities (renderers then fall back to the constant clear color, exactly as
    before this layer existed)."""
    data = world.extract_raster_host()
    if data is None:
        return None, None
    va, vb, vc, colors = data
    tris = make_triangles_np(va, vb, vc, np.zeros(va.shape[0], np.int32))
    color, depth = _jitted_rasterize(config, tuple(float(x) for x in clear_color))(
        tris=tris, tri_colors=jnp.asarray(colors), cam=cam)
    return color, depth
