"""Pallas path-tracing megakernel — the TPU twin of the reference's fragment shader.

The reference runs the whole path tracer as one GPU megakernel, one thread per pixel
(raytrace.wgsl:93-224). This is the TPU-native equivalent: one Pallas kernel instance
per *tile* of ``TILE_SUB × 128`` pixels, with the entire scene resident in VMEM and
the sample and bounce loops fused inside the kernel — so the only HBM traffic per
frame is the final per-pixel color/depth write. (The XLA wavefront in
``engine.renderer`` round-trips multi-GB [rays × spheres] intermediates through HBM
every bounce; this kernel is the fix.)

Design notes (constraints discovered by probing Mosaic on TPU v5e):

- No dynamic scalar indexing of VMEM and no per-lane gathers → the sphere loop is a
  *statically unrolled* walk over 128-wide sphere chunks, computing dense
  ``(TILE_SUB, 128 rays, 128 spheres)`` pair blocks (pure full-width VPU work).
- Winning-sphere attributes are fetched with a **one-hot MXU matmul**:
  ``attrs[16, S] @ onehot[S, TILE]``. The MXU truncates inputs to bf16, so the
  attribute table is split hi/lo (bf16x2) for ~f32 accuracy; the one-hot itself is
  exact in bf16.
- Shading, RNG, and sky reuse the exact same jnp building blocks as the XLA
  renderer (core.rng, kernels.shade, kernels.composite), so the two paths stay
  bit-comparable — that equivalence is asserted in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import rng
from ...core.constants import INF, T_MIN
from ...core.types import CameraState, RenderConfig, SceneBuffers
from ...core.vec import Vec3
from ...engine import slots
from ..composite import background_gradient, linear_to_gamma
from ..intersect import HitInfo, MaterialLanes
from ..shade import scatter

TILE_SUB = 8          # sublanes per tile
TILE = TILE_SUB * 128  # rays per kernel instance
SPHERE_CHUNK = 128     # spheres per pair block (lane dim)

# Attribute-table rows (one-hot gather): centers + the 7 shaded material fields.
ATTR_CX, ATTR_CY, ATTR_CZ = 0, 1, 2
ATTR_BASE_R, ATTR_BASE_G, ATTR_BASE_B = 3, 4, 5
ATTR_METALLIC, ATTR_ROUGHNESS, ATTR_IOR, ATTR_TRANS = 6, 7, 8, 9
N_ATTR = 16            # padded to a sublane multiple

# Camera/scalar uniform slots (SMEM row vector).
(C_POS_X, C_POS_Y, C_POS_Z, C_DIR_X, C_DIR_Y, C_DIR_Z, C_UP_X, C_UP_Y, C_UP_Z,
 C_RIGHT_X, C_RIGHT_Y, C_RIGHT_Z, C_SCALE, C_ASPECT, C_NEAR, C_FAR,
 C_WIDTH, C_HEIGHT, C_NPIX) = range(19)
N_CAM = 24


def _draw(stream, slot):
    return rng.draw(stream, slot)


def _ball(stream, base, first):
    us = [_draw(stream, base + np.uint32(first + k)) for k in range(5)]
    return rng.unit_ball_from_uniforms(*us)


def _intersect_chunks(origin: Vec3, direction: Vec3, cx_ref, cy_ref, cz_ref, r_ref,
                      n_chunks: int):
    """Dense all-pairs nearest hit over statically unrolled 128-sphere chunks.

    Pair blocks are (TILE_SUB, 128 rays, 128 spheres): the sphere chunk rides the
    lane dimension, rays ride sublanes+leading — every op is full VPU width.
    Semantics identical to kernels.intersect.intersect_spheres (near root only,
    t > 0.001, nearest wins; zero radius marks padding).
    """
    a = direction.dot(direction)
    inv_a = 1.0 / a
    ax = a[:, :, None]
    inv_ax = inv_a[:, :, None]
    ox, oy, oz = origin.x[:, :, None], origin.y[:, :, None], origin.z[:, :, None]
    dx, dy, dz = (direction.x[:, :, None], direction.y[:, :, None],
                  direction.z[:, :, None])

    best_t = jnp.full((TILE_SUB, 128), INF, jnp.float32)
    best_i = jnp.full((TILE_SUB, 128), -1, jnp.int32)
    for c in range(n_chunks):
        sl = slice(c * SPHERE_CHUNK, (c + 1) * SPHERE_CHUNK)
        ccx = cx_ref[0, sl][None, None, :]
        ccy = cy_ref[0, sl][None, None, :]
        ccz = cz_ref[0, sl][None, None, :]
        cr = r_ref[0, sl][None, None, :]
        ocx = ccx - ox
        ocy = ccy - oy
        ocz = ccz - oz
        h = dx * ocx + dy * ocy + dz * ocz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - cr * cr
        disc = h * h - ax * cc
        t = (h - jnp.sqrt(jnp.maximum(disc, 0.0))) * inv_ax
        ok = (disc >= 0.0) & (t > T_MIN) & (cr > 0.0)
        t = jnp.where(ok, t, INF)
        # Nearest within chunk, lowest index on ties (match XLA argmin semantics).
        ct = jnp.min(t, axis=2)
        lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 2)
        ci = jnp.min(jnp.where(t == ct[:, :, None], lane, SPHERE_CHUNK), axis=2)
        take = ct < best_t
        best_i = jnp.where(take, ci + c * SPHERE_CHUNK, best_i)
        best_t = jnp.where(take, ct, best_t)
    return best_t, best_i


def _gather_attrs(best_i, attr_hi, attr_lo, n_spheres_padded: int):
    """attrs[:, best_i] for every ray via one-hot matmuls on the MXU.

    ``attr_hi/lo`` are (N_ATTR, S) bf16 (hi/lo split of the f32 table). Returns a
    list of N_ATTR (TILE_SUB, 128) f32 arrays; miss lanes (best_i < 0) get zeros.

    Done one sublane-row at a time — onehot_r is (S, 128) built from a (1, 128)
    row slice, so no sublane↔lane relayout ever happens (reshapes of (8,128) to
    (1,1024) were the dominant per-bounce cost in the fused kernel).
    """
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (n_spheres_padded, 128), 0)
    rows = []
    for r in range(TILE_SUB):
        onehot = (iota_s == best_i[r:r + 1, :]).astype(jnp.bfloat16)  # (S, 128)
        out = jnp.dot(attr_hi, onehot, preferred_element_type=jnp.float32)
        out = out + jnp.dot(attr_lo, onehot, preferred_element_type=jnp.float32)
        rows.append(out)                                              # (N_ATTR, 128)
    # attrs[j] as (TILE_SUB, 128): stack row j of every per-sublane result.
    return [jnp.concatenate([rows[r][j:j + 1, :] for r in range(TILE_SUB)], axis=0)
            for j in range(10)]


def _row(attrs, j):
    return attrs[j]


def _render_kernel(cam_ref, seed_ref, cx_ref, cy_ref, cz_ref, r_ref,
                   attr_hi_ref, attr_lo_ref,
                   out_r_ref, out_g_ref, out_b_ref, out_depth_ref, out_seg_ref,
                   *, config: RenderConfig, n_spheres_padded: int):
    tile_id = pl.program_id(0)
    n_chunks = n_spheres_padded // SPHERE_CHUNK

    # ---- per-tile pixel coordinates -------------------------------------------
    sub = jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, 128), 1)
    pixel_index = tile_id * TILE + sub * 128 + lane
    width_f = cam_ref[0, C_WIDTH]
    width_i = width_f.astype(jnp.int32)
    px = pixel_index % width_i
    py = pixel_index // width_i
    in_image = pixel_index < cam_ref[0, C_NPIX].astype(jnp.int32)
    u = (px.astype(jnp.float32) + 0.5) / width_f
    v = (py.astype(jnp.float32) + 0.5) / cam_ref[0, C_HEIGHT]

    cam_pos = Vec3(cam_ref[0, C_POS_X], cam_ref[0, C_POS_Y], cam_ref[0, C_POS_Z])
    cam_dir = Vec3(cam_ref[0, C_DIR_X], cam_ref[0, C_DIR_Y], cam_ref[0, C_DIR_Z])
    cam_up = Vec3(cam_ref[0, C_UP_X], cam_ref[0, C_UP_Y], cam_ref[0, C_UP_Z])
    cam_right = Vec3(cam_ref[0, C_RIGHT_X], cam_ref[0, C_RIGHT_Y],
                     cam_ref[0, C_RIGHT_Z])
    scale = cam_ref[0, C_SCALE]
    aspect = cam_ref[0, C_ASPECT]
    far = cam_ref[0, C_FAR]
    fallback_far = far + 10.0 if config.level == 1 else far - 1.0
    frame_seed = seed_ref[0, 0]

    attr_hi = attr_hi_ref[:]
    attr_lo = attr_lo_ref[:]

    def trace_one_sample(sample_idx):
        """One sample for every ray in the tile (wgsl raytrace(), :174-224)."""
        stream = rng.stream_init(pixel_index.astype(jnp.uint32),
                                 sample_idx.astype(jnp.uint32), frame_seed)
        # Jittered primary ray (random_ray_from_uv, wgsl:139-156).
        ju = _draw(stream, np.uint32(slots.JITTER_U))
        jv = _draw(stream, np.uint32(slots.JITTER_V))
        h_px = cam_ref[0, C_HEIGHT]
        w_px = h_px * aspect
        ndc_x = (u * 2.0 - 1.0) + (ju - 0.5) / w_px
        ndc_y = (1.0 - v * 2.0) + (jv - 0.5) / h_px
        d = (cam_dir + cam_right.scale(ndc_x * aspect * scale)
             + cam_up.scale(ndc_y * scale)).normalize()
        o = Vec3(jnp.broadcast_to(cam_pos.x, d.x.shape),
                 jnp.broadcast_to(cam_pos.y, d.y.shape),
                 jnp.broadcast_to(cam_pos.z, d.z.shape))

        # The active mask is carried as f32: Mosaic's while-loop lowering is
        # unreliable for i1 vector carries (layout mismatch at the yield).
        def cond(carry):
            b, _, _, _, _, active_f, _, _ = carry
            return (b <= config.bounces) & (jnp.max(active_f) > 0.0)

        def body(carry):
            b, o, d, ray_color, light, active_f, first_depth, segs = carry
            active = active_f > 0.0
            t, idx = _intersect_chunks(o, d, cx_ref, cy_ref, cz_ref, r_ref,
                                       n_chunks)
            miss = t >= INF
            first_depth = jnp.where(b == 0, t, first_depth)
            light = Vec3.where(active & miss, background_gradient(d), light)
            active_hit = active & ~miss

            attrs = _gather_attrs(idx, attr_hi, attr_lo, n_spheres_padded)
            center = Vec3(_row(attrs, ATTR_CX), _row(attrs, ATTR_CY),
                          _row(attrs, ATTR_CZ))
            safe_t = jnp.where(miss, 0.0, t)
            position = o + d.scale(safe_t)
            normal = (position - center).normalize()
            normal = Vec3.where(miss, Vec3.full((), 0.0, 1.0, 0.0), normal)
            hit = HitInfo(t=t, miss=miss, position=position, normal=normal,
                          material_id=idx, front_face=d.dot(normal) < 0.0)
            mat = MaterialLanes(
                base_color=Vec3(_row(attrs, ATTR_BASE_R), _row(attrs, ATTR_BASE_G),
                                _row(attrs, ATTR_BASE_B)),
                metallic=_row(attrs, ATTR_METALLIC),
                roughness=_row(attrs, ATTR_ROUGHNESS),
                ior=_row(attrs, ATTR_IOR),
                specular_transmission=_row(attrs, ATTR_TRANS),
            )

            base = jnp.uint32(slots.RAYGEN_DRAWS) + (
                b.astype(jnp.uint32) * np.uint32(slots.DRAWS_PER_BOUNCE))
            u_metal = _draw(stream, base + np.uint32(slots.S_METAL))
            u_trans = _draw(stream, base + np.uint32(slots.S_TRANS))
            u_reflect = _draw(stream, base + np.uint32(slots.S_REFLECT))
            ball1 = _ball(stream, base, slots.S_BALL1)
            ball2 = _ball(stream, base, slots.S_BALL2)
            sc = scatter(d, hit, mat, u_metal, u_trans, u_reflect, ball1, ball2)

            cont = active_hit & ~sc.absorbed
            ray_color = Vec3.where(cont, ray_color * sc.attenuation, ray_color)
            o = Vec3.where(active_hit, hit.position, o)
            d = Vec3.where(active_hit, sc.direction, d)
            segs = segs + jnp.where(active, 1.0, 0.0)
            return (b + 1, o, d, ray_color, light, jnp.where(cont, 1.0, 0.0),
                    first_depth, segs)

        n = (TILE_SUB, 128)
        init = (jnp.int32(0), o, d,
                Vec3.full(n, 1.0, 1.0, 1.0), Vec3.full(n, 0.0, 0.0, 0.0),
                jnp.where(in_image, 1.0, 0.0), jnp.full(n, INF, jnp.float32),
                jnp.zeros(n, jnp.float32))
        (_, _, _, ray_color, light, active_f, first_depth, segs) = (
            jax.lax.while_loop(cond, body, init))

        color = Vec3.where(active_f > 0.0, Vec3.splat(jnp.float32(0.0)),
                           ray_color * light)          # exhausted → black
        depth = jnp.where(first_depth >= INF, fallback_far, first_depth)
        return linear_to_gamma(color), depth, segs

    def sample_body(i, acc):
        cr, cg, cb, dsum, segsum = acc
        color, depth, segs = trace_one_sample(i)
        return (cr + color.x, cg + color.y, cb + color.z, dsum + depth,
                segsum + segs)

    zero2 = jnp.zeros((TILE_SUB, 128), jnp.float32)
    cr, cg, cb, dsum, segsum = jax.lax.fori_loop(
        0, config.samples_per_pixel, sample_body,
        (zero2, zero2, zero2, zero2, zero2))

    inv_spp = np.float32(1.0 / config.samples_per_pixel)
    out_r_ref[0] = cr * inv_spp
    out_g_ref[0] = cg * inv_spp
    out_b_ref[0] = cb * inv_spp
    out_depth_ref[0] = dsum * inv_spp
    out_seg_ref[0] = segsum


class PallasScene(NamedTuple):
    """Kernel-ready scene: sphere SoA rows + bf16x2 attribute table."""

    cx: jnp.ndarray       # (1, S) f32
    cy: jnp.ndarray
    cz: jnp.ndarray
    radius: jnp.ndarray
    attr_hi: jnp.ndarray  # (N_ATTR, S) bf16
    attr_lo: jnp.ndarray  # (N_ATTR, S) bf16


def prepare_pallas_scene(scene: SceneBuffers) -> PallasScene:
    """Resolve material indirection to a dense per-sphere table and split bf16x2.

    Runs once per scene revision (jit-cached by shapes); the reference re-uploads
    equivalent tables every frame (extract.rs:334-336) — here they persist.
    """
    sp = scene.spheres
    mt = scene.materials
    mid = jnp.clip(sp.material_id, 0, mt.capacity - 1)
    radius = jnp.where(sp.valid, sp.radius, 0.0)
    attr = jnp.stack([
        sp.cx, sp.cy, sp.cz,
        mt.base_r[mid], mt.base_g[mid], mt.base_b[mid],
        mt.metallic[mid], mt.roughness[mid], mt.ior[mid],
        mt.specular_transmission[mid],
    ] + [jnp.zeros_like(sp.cx)] * (N_ATTR - 10), axis=0)
    attr_hi = attr.astype(jnp.bfloat16)
    attr_lo = (attr - attr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return PallasScene(cx=sp.cx[None, :], cy=sp.cy[None, :], cz=sp.cz[None, :],
                       radius=radius[None, :], attr_hi=attr_hi, attr_lo=attr_lo)


def _pack_camera(cam: CameraState, config: RenderConfig):
    right = cam.direction.cross(cam.up)   # wgsl:149
    vals = jnp.zeros((1, N_CAM), jnp.float32)
    entries = {
        C_POS_X: cam.position.x, C_POS_Y: cam.position.y, C_POS_Z: cam.position.z,
        C_DIR_X: cam.direction.x, C_DIR_Y: cam.direction.y, C_DIR_Z: cam.direction.z,
        C_UP_X: cam.up.x, C_UP_Y: cam.up.y, C_UP_Z: cam.up.z,
        C_RIGHT_X: right.x, C_RIGHT_Y: right.y, C_RIGHT_Z: right.z,
        C_SCALE: jnp.tan(cam.fov * 0.5), C_ASPECT: cam.aspect,
        C_NEAR: cam.near, C_FAR: cam.far,
        C_WIDTH: jnp.float32(config.width), C_HEIGHT: jnp.float32(config.height),
        C_NPIX: jnp.float32(config.n_pixels),
    }
    for k, val in entries.items():
        vals = vals.at[0, k].set(jnp.asarray(val, jnp.float32))
    return vals


def render_tiles(pscene: PallasScene, cam: CameraState, config: RenderConfig,
                 frame_seed):
    """Run the megakernel over the frame. Returns (r, g, b, depth) as [N_padded]
    flat arrays plus the traced-segment count (f32 scalar)."""
    n = config.n_pixels
    n_tiles = -(-n // TILE)
    s = pscene.cx.shape[1]
    assert s % SPHERE_CHUNK == 0

    cam_row = _pack_camera(cam, config)
    seed = jnp.asarray(frame_seed, jnp.uint32).reshape(1, 1)

    kernel = functools.partial(_render_kernel, config=config, n_spheres_padded=s)
    grid = (n_tiles,)
    # Off-TPU (tests, CPU dev) the kernel runs in the Pallas interpreter, which
    # executes the same program with XLA ops — slow but exact.
    interpret = jax.default_backend() != "tpu"
    tile_spec = pl.BlockSpec((1, TILE_SUB, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N_CAM), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((1, s)), full((1, s)), full((1, s)), full((1, s)),
            full((N_ATTR, s)), full((N_ATTR, s)),
        ],
        out_specs=[tile_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, TILE_SUB, 128), jnp.float32),
        ] * 5,
        interpret=interpret,
    )(cam_row, seed, pscene.cx, pscene.cy, pscene.cz, pscene.radius,
      pscene.attr_hi, pscene.attr_lo)
    r, g, b, depth, segs = outs
    flat = lambda x: x.reshape(n_tiles * TILE)
    return flat(r), flat(g), flat(b), flat(depth), jnp.sum(segs)
