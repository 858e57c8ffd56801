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
so the ambient radiance factor is 80 / (125 · 1.2) = 0.5333.

The per-pixel term reproduces Bevy's ``ambient_light`` (bevy_pbr
``ambient.wgsl``, the Karis split-sum EnvBRDFApprox):

    diffuse_ambient  = EnvBRDFApprox(diffuse_color, F_AB(1.0, NdotV))
    specular_ambient = EnvBRDFApprox(F0, F_AB(perceptual_roughness, NdotV))
    out = (diffuse_ambient + specular_ambient · specular_occlusion) · ambient

with ``diffuse_color = base · (1 − metallic)``, ``F0 = 0.16·reflectance²·
(1 − metallic) + base·metallic``, ``specular_occlusion =
saturate(dot(F0, vec3(50·0.33)))`` (Filament's pre-baked specular occlusion)
and screen-space occlusion = 1 (the reference adds no SSAO). This closes the
round-3 divergence note: both the F_ab environment-specular term AND the
F_AB(1, NdotV) factor on the diffuse lobe now match Bevy's shader rather than
a flat ambient multiply. The blend logic consuming these buffers is the
faithful part (pinned against the oracle). Clear color defaults to WHITE like
the reference camera (main.rs:60).
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


def _f_ab(perceptual_roughness, no_v):
    """Bevy's ``F_AB`` (bevy_pbr ``pbr_functions``): the Karis mobile split-sum
    environment-BRDF approximation. Returns the (scale, bias) pair applied as
    ``F0 · scale + bias``."""
    rx = perceptual_roughness * -1.0 + 1.0
    ry = perceptual_roughness * -0.0275 + 0.0425
    rz = perceptual_roughness * -0.572 + 1.04
    rw = perceptual_roughness * 0.022 - 0.04
    a004 = jnp.minimum(rx * rx, jnp.exp2(-9.28 * no_v)) * rx + ry
    return -1.04 * a004 + rz, 1.04 * a004 + rw


def rasterize_impl(tris: Triangles, tri_colors: jnp.ndarray, cam: CameraState,
                   config: RenderConfig, clear_color: Tuple[float, float, float]):
    """(raster_color: Vec3 [N], raster_depth [N]) for the frame.

    One un-jittered center ray per pixel (the raster sample grid); nearest
    triangle wins; depth = ``near / view_z`` (reverse-Z, 0 = clear/far).
    ``tri_colors``: [T, 6] linear per-triangle base color, metallic,
    perceptual_roughness, reflectance.
    """
    u, v = pixel_uv(config.width, config.height)
    half = jnp.full_like(u, 0.5)          # (j - 0.5)/w == 0 → exact pixel center
    origin, direction = generate_rays(u, v, half, half, cam, config.height)

    t, idx = intersect_triangles(origin, direction, tris)
    hit = t < INF   # miss sentinel is f32::MAX (core.constants), not jnp.inf
    safe_idx = jnp.clip(idx, 0, tris.capacity - 1)
    safe_t = jnp.where(hit, t, 1.0)

    # Bevy ambient_light (see module docstring): split-sum diffuse + specular
    # environment terms under the default 80-lux white ambient, no SSAO.
    base = Vec3(tri_colors[safe_idx, 0], tri_colors[safe_idx, 1],
                tri_colors[safe_idx, 2])
    metallic = tri_colors[safe_idx, 3]
    rough = tri_colors[safe_idx, 4]
    refl = tri_colors[safe_idx, 5]

    # Geometric normal of the hit triangle, flipped toward the viewer; NdotV
    # with Bevy's 1e-4 clamp (V = −ray direction; center rays are unit-length
    # from generate_rays' normalize).
    a_c = Vec3(tris.ax[safe_idx], tris.ay[safe_idx], tris.az[safe_idx])
    ab = Vec3(tris.bx[safe_idx], tris.by[safe_idx], tris.bz[safe_idx]) - a_c
    ac = Vec3(tris.cx[safe_idx], tris.cy[safe_idx], tris.cz[safe_idx]) - a_c
    n = ab.cross(ac).normalize()
    no_v = jnp.maximum(jnp.abs(n.dot(direction)), 1e-4)

    diffuse = base.scale(1.0 - metallic)
    f0 = base.scale(metallic) + Vec3.splat(1.0).scale(
        0.16 * refl * refl * (1.0 - metallic))
    d_scale, d_bias = _f_ab(jnp.float32(1.0), no_v)
    s_scale, s_bias = _f_ab(rough, no_v)
    spec_occ = jnp.clip((f0.x + f0.y + f0.z) * (50.0 * 0.33), 0.0, 1.0)
    shaded = (diffuse.scale(d_scale) + Vec3.splat(d_bias)
              + (f0.scale(s_scale) + Vec3.splat(s_bias)).scale(spec_occ)
              ).scale(_AMBIENT)

    cr, cg, cb = (jnp.float32(x) for x in clear_color)
    color = Vec3(jnp.where(hit, shaded.x, cr),
                 jnp.where(hit, shaded.y, cg),
                 jnp.where(hit, shaded.z, cb))

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
