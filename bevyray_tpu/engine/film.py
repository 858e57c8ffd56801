"""Progressive sample accumulation — persistent HBM state across frames.

The reference re-estimates every frame from scratch at 4 spp with no accumulation
(SURVEY.md §5 checkpoint/resume: "no accumulation buffer either"); BASELINE.json's
north star adds HBM accumulation as the first real persistent state. ``Film`` holds
running sums on device; each ``accumulate`` step traces ``spp`` fresh samples (with a
per-step sample-index offset so RNG streams never repeat) and adds them in place.

Reset-on-camera-move is host-side policy (see ``ProgressiveRenderer``): the film is
zeroed whenever the camera state changes, the standard real-time-path-tracer design.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import CameraState, RenderConfig, SceneBuffers
from ..core.vec import Vec3
from ..kernels.composite import composite
from ..kernels.raygen import pixel_uv
from .renderer import FrameResult, trace_sample


class Film(NamedTuple):
    color_sum: Vec3          # [N] running sum of gamma-space sample colors
    depth_sum: jnp.ndarray   # [N]
    n_samples: jnp.ndarray   # f32 scalar — samples accumulated per pixel
    rays_traced: jnp.ndarray  # f32 scalar — total segments ever traced


def save_film(path: str, film: Film, config: Optional[RenderConfig] = None) -> None:
    """Checkpoint the accumulation state (the framework's persistent state —
    SURVEY.md §5 notes the reference has none). Plain .npz, host round-trip.
    When ``config`` is given, width/height are stored so a resume into a
    different-geometry config fails loudly instead of garbling the image."""
    extra = {}
    if config is not None:
        extra = {"width": np.int64(config.width), "height": np.int64(config.height)}
    np.savez(path, color_x=np.asarray(film.color_sum.x),
             color_y=np.asarray(film.color_sum.y),
             color_z=np.asarray(film.color_sum.z),
             depth=np.asarray(film.depth_sum),
             n_samples=np.asarray(film.n_samples),
             rays_traced=np.asarray(film.rays_traced), **extra)


def load_film(path: str, config: Optional[RenderConfig] = None) -> Film:
    z = np.load(path)
    if config is not None:
        if "width" in z:
            w, h = int(z["width"]), int(z["height"])
            if (w, h) != (config.width, config.height):
                raise ValueError(
                    f"film checkpoint {path!r} is {w}x{h} but the renderer "
                    f"config is {config.width}x{config.height}")
        elif z["color_x"].shape[0] != config.n_pixels:
            raise ValueError(
                f"film checkpoint {path!r} has {z['color_x'].shape[0]} pixels "
                f"but the renderer config expects {config.n_pixels}")
    return Film(color_sum=Vec3(jnp.asarray(z["color_x"]), jnp.asarray(z["color_y"]),
                               jnp.asarray(z["color_z"])),
                depth_sum=jnp.asarray(z["depth"]),
                n_samples=jnp.asarray(z["n_samples"]),
                rays_traced=jnp.asarray(z["rays_traced"]))


def new_film(config: RenderConfig) -> Film:
    n = config.n_pixels
    return Film(color_sum=Vec3.full((n,), 0.0, 0.0, 0.0),
                depth_sum=jnp.zeros((n,), jnp.float32),
                n_samples=jnp.float32(0.0),
                rays_traced=jnp.float32(0.0))


def accumulate_impl(film: Film, scene: SceneBuffers, cam: CameraState,
                    config: RenderConfig, frame_seed, sample_offset) -> Film:
    n = config.n_pixels
    u, v = pixel_uv(config.width, config.height)
    pixel_ids = jnp.arange(n, dtype=jnp.uint32)

    def body(i, f: Film) -> Film:
        color, depth, segments = trace_sample(
            scene, cam, config, pixel_ids, u, v,
            (sample_offset + i).astype(jnp.uint32), frame_seed)
        return Film(color_sum=f.color_sum + color,
                    depth_sum=f.depth_sum + depth,
                    n_samples=f.n_samples + 1.0,
                    rays_traced=f.rays_traced + segments)

    return jax.lax.fori_loop(0, config.samples_per_pixel, body, film)


def resolve_impl(film: Film, cam: CameraState, config: RenderConfig,
                 raster_color: Vec3, raster_depth) -> FrameResult:
    h, w = config.height, config.width
    n = h * w
    inv = 1.0 / jnp.maximum(film.n_samples, 1.0)
    rt_color = film.color_sum.scale(inv)
    rt_depth = film.depth_sum * inv
    out = composite(config.level, rt_color, rt_depth, cam.near, cam.far,
                    raster_color, raster_depth)
    img = jnp.stack([jnp.broadcast_to(out.x, (n,)),
                     jnp.broadcast_to(out.y, (n,)),
                     jnp.broadcast_to(out.z, (n,))], axis=-1)
    return FrameResult(image=img.reshape(h, w, 3),
                       rt_depth=rt_depth.reshape(h, w),
                       rays_traced=film.rays_traced)


@functools.lru_cache(maxsize=32)
def _jitted_accumulate(config: RenderConfig):
    # Donate the film so accumulation is a true in-place HBM update.
    return jax.jit(functools.partial(accumulate_impl, config=config),
                   donate_argnames=("film",))


@functools.lru_cache(maxsize=32)
def _jitted_resolve(config: RenderConfig):
    return jax.jit(functools.partial(resolve_impl, config=config))


def pallas_accumulate_impl(film: Film, pscene, cam: CameraState,
                           config: RenderConfig, frame_seed, sample_offset,
                           sl=None, slmeta=None, slattr=None,
                           has_emissive: bool = True) -> Film:
    """Megakernel-backed accumulation: one fused kernel pass traces
    ``config.samples_per_pixel`` fresh samples (offset so streams never repeat)
    and returns SUMS that fold into the film."""
    from ..kernels.pallas.megakernel import render_tiles, unshuffle_blocks

    r, g, b, depth, segs = render_tiles(pscene, cam, config, frame_seed,
                                        slattr=slattr,
                                        sample_offset=sample_offset,
                                        normalize=False, sl=sl, slmeta=slmeta,
                                        has_emissive=has_emissive)
    r, g, b, depth = (unshuffle_blocks(x, config) for x in (r, g, b, depth))
    return Film(color_sum=film.color_sum + Vec3(r, g, b),
                depth_sum=film.depth_sum + depth,
                n_samples=film.n_samples + config.samples_per_pixel,
                rays_traced=film.rays_traced + segs)


@functools.lru_cache(maxsize=32)
def _jitted_pallas_accumulate(config: RenderConfig, has_emissive: bool = True):
    # has_emissive is static (parked-state layout — megakernel._st_layout).
    return jax.jit(functools.partial(pallas_accumulate_impl, config=config,
                                     has_emissive=has_emissive),
                   donate_argnames=("film",))


class ProgressiveRenderer:
    """Accumulating front-end: call ``step`` repeatedly; the estimate refines.

    The film auto-resets when the camera pose/projection changes (compared on
    host — camera state is a handful of scalars). ``backend="pallas"`` runs each
    pass through the fused megakernel (hardware RNG on TPU).
    """

    def __init__(self, config: RenderConfig, backend: str = "xla"):
        self.config = config
        self.backend = backend
        self.film = new_film(config)
        if backend == "pallas":
            self._accumulate = _jitted_pallas_accumulate(config)
            self._prepare_cache = None
        else:
            self._accumulate = _jitted_accumulate(config)
        self._resolve = _jitted_resolve(config)
        self._last_cam_key = None
        self._sample_offset = 0

    def _cam_key(self, cam: CameraState):
        leaves = jax.tree.leaves(cam)
        return tuple(float(np.asarray(x)) for x in leaves)

    def reset(self) -> None:
        self.film = new_film(self.config)
        self._sample_offset = 0

    def step(self, scene: SceneBuffers, cam: CameraState, seed: int,
             raster_color: Optional[Vec3] = None,
             raster_depth=None) -> FrameResult:
        key = self._cam_key(cam)
        if key != self._last_cam_key:
            self.reset()
            self._last_cam_key = key
        if self.backend == "pallas":
            from ..kernels.pallas.megakernel import (jitted_prepare,
                                                     pscene_cache_key)

            # Key on all leaves prepare_pallas_scene bakes in (spheres,
            # materials, triangles); keep them alive so ids stay unique.
            sid, leaves = pscene_cache_key(scene)
            if self._prepare_cache is None or self._prepare_cache[0] != sid:
                from ..kernels.pallas.megakernel import scene_has_emissive
                self._prepare_cache = (
                    sid, leaves,
                    jitted_prepare(self.config.pallas_cand_size,
                                   self.config.pallas_grouping)(scene))
                self._sl_cache = None
                # Static parked-state layout flag — re-fetch the jitted step
                # for this scene's layout (lru-cached, cheap on repeats).
                self._accumulate = _jitted_pallas_accumulate(
                    self.config, scene_has_emissive(scene))
            pscene = self._prepare_cache[2]
            # Host-built primary shortlists for phase-split bounce 0 (cached;
            # the film already resets on camera change, so keying on the scene
            # id + cam key suffices). shortlists_for owns the gate — including
            # raising when a forced "split" is unsupported.
            cache = getattr(self, "_sl_cache", None)
            if cache is not None and cache[0] == (sid, key):
                sl, slmeta, slattr = cache[1]
            else:
                from ..kernels.pallas.primary import device_shortlists_for
                sl, slmeta, slattr = device_shortlists_for(
                    pscene, cam, self.config, self.config.samples_per_pixel)
                self._sl_cache = ((sid, key), (sl, slmeta, slattr))
            self.film = self._accumulate(
                film=self.film, pscene=pscene, cam=cam,
                frame_seed=jnp.uint32(seed & 0xFFFFFFFF),
                sample_offset=jnp.uint32(self._sample_offset),
                sl=sl, slmeta=slmeta, slattr=slattr)
        else:
            self.film = self._accumulate(
                film=self.film, scene=scene, cam=cam,
                frame_seed=jnp.uint32(seed & 0xFFFFFFFF),
                sample_offset=jnp.uint32(self._sample_offset))
        self._sample_offset += self.config.samples_per_pixel
        if raster_color is None:
            raster_color = Vec3.splat(jnp.float32(1.0))
        if raster_depth is None:
            raster_depth = jnp.float32(0.0)
        return self._resolve(film=self.film, cam=cam,
                             raster_color=raster_color,
                             raster_depth=raster_depth)

    @property
    def samples_accumulated(self) -> int:
        return self._sample_offset

    # -- checkpoint / resume -----------------------------------------------------
    def save(self, path: str) -> None:
        save_film(path, self.film, self.config)

    def load(self, path: str, cam: CameraState) -> None:
        """Resume accumulation from a checkpoint taken with the same config and
        camera; subsequent steps continue the sample-index sequence exactly.
        Raises ValueError on a width/height mismatch with this config."""
        self.film = load_film(path, self.config)
        self._sample_offset = int(np.asarray(self.film.n_samples))
        self._last_cam_key = self._cam_key(cam)
