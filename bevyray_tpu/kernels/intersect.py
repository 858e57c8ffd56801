"""Ray–sphere intersection — the hot kernel.

Twin of ``hit_sphere`` + ``raycast_against_range`` (raytrace.wgsl:348-383), with the
reference's exact acceptance semantics:

- **near root only**: ``t = (h - sqrt(disc)) / a`` — rays starting inside a sphere
  never hit its far wall (SURVEY.md quirk #2);
- accept iff ``disc >= 0 && t > 0.001 && t < closest`` (wgsl:353-354);
- normals always outward, never flipped (wgsl:356, quirk #3);
- ``front_face = dot(dir, normal) < 0`` (wgsl:358).

TPU-first shape: instead of one thread walking a sphere list, we test a whole ray
batch against sphere *chunks* as dense [rays × chunk] elementwise blocks (perfect VPU
tiling, zero gathers in the test loop), keeping a running (t, index) min. A single
gather per bounce then fetches the winning sphere's attributes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.constants import INF, T_MIN
from ..core.types import Materials, Spheres
from ..core.vec import Vec3


class HitInfo(NamedTuple):
    """Batched twin of the WGSL HitInfo struct (raytrace.wgsl:301-307)."""

    t: jnp.ndarray           # f32, INF on miss
    miss: jnp.ndarray        # bool
    position: Vec3
    normal: Vec3             # outward, unit
    material_id: jnp.ndarray  # i32
    front_face: jnp.ndarray  # bool


def intersect_spheres(origin: Vec3, direction: Vec3, spheres: Spheres,
                      chunk: int = 512):
    """Nearest-hit over the whole (padded) sphere table.

    Returns ``(t, index)`` with ``t = INF`` / ``index = -1`` on miss. Scans the table
    in chunks so peak live memory is [rays, chunk] regardless of scene size.
    """
    n_rays = origin.x.shape[0]
    cap = spheres.capacity
    if cap % chunk != 0:
        chunk = cap  # capacity is lane-padded; fall back to one block

    a = direction.dot(direction)                      # [N] (dirs may be non-unit)
    inv_a = 1.0 / a

    def chunk_body(carry, xs):
        best_t, best_i = carry
        ccx, ccy, ccz, cr, cvalid, cbase = xs
        # oc = center - origin (wgsl:372), pairwise [N, C]
        ocx = ccx[None, :] - origin.x[:, None]
        ocy = ccy[None, :] - origin.y[:, None]
        ocz = ccz[None, :] - origin.z[:, None]
        h = (direction.x[:, None] * ocx + direction.y[:, None] * ocy
             + direction.z[:, None] * ocz)                          # wgsl:374
        c = ocx * ocx + ocy * ocy + ocz * ocz - (cr * cr)[None, :]  # wgsl:375
        disc = h * h - a[:, None] * c                               # wgsl:376
        t = (h - jnp.sqrt(jnp.maximum(disc, 0.0))) * inv_a[:, None]  # wgsl:382
        ok = (disc >= 0.0) & (t > T_MIN) & cvalid[None, :]          # wgsl:353
        t = jnp.where(ok, t, INF)
        ci = jnp.argmin(t, axis=1)
        ct = jnp.take_along_axis(t, ci[:, None], axis=1)[:, 0]
        take_new = ct < best_t                                      # wgsl:354
        best_i = jnp.where(take_new, cbase + ci.astype(jnp.int32), best_i)
        best_t = jnp.where(take_new, ct, best_t)
        return (best_t, best_i), None

    n_chunks = cap // chunk
    xs = (
        spheres.cx.reshape(n_chunks, chunk),
        spheres.cy.reshape(n_chunks, chunk),
        spheres.cz.reshape(n_chunks, chunk),
        spheres.radius.reshape(n_chunks, chunk),
        spheres.valid.reshape(n_chunks, chunk),
        (jnp.arange(n_chunks, dtype=jnp.int32) * chunk),
    )
    init = (jnp.full((n_rays,), INF, jnp.float32), jnp.full((n_rays,), -1, jnp.int32))
    if n_chunks == 1:
        (best_t, best_i), _ = chunk_body(init, jax.tree.map(lambda v: v[0], xs))
    else:
        (best_t, best_i), _ = jax.lax.scan(chunk_body, init, xs)
    return best_t, best_i


def make_hit_info(origin: Vec3, direction: Vec3, t: jnp.ndarray, index: jnp.ndarray,
                  spheres: Spheres) -> HitInfo:
    """Gather hit attributes for the winning sphere (raycast_against_range body,
    wgsl:355-358). Values on missed lanes are well-defined garbage (masked later)."""
    miss = t >= INF
    safe_t = jnp.where(miss, 0.0, t)
    idx = jnp.clip(index, 0, spheres.capacity - 1)
    center = Vec3(spheres.cx[idx], spheres.cy[idx], spheres.cz[idx])
    position = origin + direction.scale(safe_t)       # ray_at, wgsl:130-132
    normal = (position - center).normalize()          # outward (wgsl:356)
    # Guard padding/miss lanes against 0/0 normals.
    normal = Vec3.where(miss, Vec3.full((), 0.0, 1.0, 0.0), normal)
    front_face = direction.dot(normal) < 0.0          # wgsl:358
    return HitInfo(
        t=t, miss=miss, position=position, normal=normal,
        material_id=spheres.material_id[idx], front_face=front_face,
    )


class MaterialLanes(NamedTuple):
    """Per-ray gathered material attributes."""

    base_color: Vec3
    metallic: jnp.ndarray
    roughness: jnp.ndarray
    ior: jnp.ndarray
    specular_transmission: jnp.ndarray
    emissive: Vec3


def gather_materials(materials: Materials, material_id: jnp.ndarray) -> MaterialLanes:
    idx = jnp.clip(material_id, 0, materials.capacity - 1)
    return MaterialLanes(
        base_color=Vec3(materials.base_r[idx], materials.base_g[idx],
                        materials.base_b[idx]),
        metallic=materials.metallic[idx],
        roughness=materials.roughness[idx],
        ior=materials.ior[idx],
        specular_transmission=materials.specular_transmission[idx],
        emissive=Vec3(materials.emissive_r[idx], materials.emissive_g[idx],
                      materials.emissive_b[idx]),
    )
