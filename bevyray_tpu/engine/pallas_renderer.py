"""Pallas-megakernel renderer front-end — same API/semantics as engine.Renderer,
hot path in kernels/pallas/megakernel.py."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.types import CameraState, RenderConfig, SceneBuffers
from ..core.vec import Vec3
from ..kernels.composite import composite
from ..kernels.pallas.megakernel import (PallasScene, pscene_cache_key,
                                         render_tiles, unshuffle_blocks)
from .renderer import FrameResult


def pallas_render_impl(pscene: PallasScene, cam: CameraState, config: RenderConfig,
                       frame_seed, raster_color: Vec3, raster_depth,
                       exact_rng: bool = False, sl=None, slmeta=None,
                       slattr=None, has_emissive: bool = True) -> FrameResult:
    h, w = config.height, config.width
    n = h * w
    if config.level == 0:   # Skip: raster passthrough, no tracing (wgsl:97-99)
        img = jnp.stack([jnp.broadcast_to(raster_color.x, (n,)),
                         jnp.broadcast_to(raster_color.y, (n,)),
                         jnp.broadcast_to(raster_color.z, (n,))], axis=-1)
        return FrameResult(image=img.reshape(h, w, 3),
                           rt_depth=jnp.zeros((h, w), jnp.float32),
                           rays_traced=jnp.float32(0.0))
    r, g, b, depth, segs = render_tiles(pscene, cam, config, frame_seed,
                                        exact_rng=exact_rng, sl=sl,
                                        slmeta=slmeta, slattr=slattr,
                                        has_emissive=has_emissive)
    r, g, b, depth = (unshuffle_blocks(x, config) for x in (r, g, b, depth))
    rt_color = Vec3(r, g, b)
    rt_depth = depth
    out = composite(config.level, rt_color, rt_depth, cam.near, cam.far,
                    raster_color, raster_depth)
    img = jnp.stack([jnp.broadcast_to(out.x, (n,)), jnp.broadcast_to(out.y, (n,)),
                     jnp.broadcast_to(out.z, (n,))], axis=-1)
    return FrameResult(image=img.reshape(h, w, 3), rt_depth=rt_depth.reshape(h, w),
                       rays_traced=segs)


@functools.lru_cache(maxsize=32)
def _jitted(config: RenderConfig, exact_rng: bool, has_emissive: bool = True):
    # has_emissive is static (it shapes the kernel's parked-state layout —
    # megakernel._st_layout), so it keys its own compiled step.
    return jax.jit(functools.partial(pallas_render_impl, config=config,
                                     exact_rng=exact_rng,
                                     has_emissive=has_emissive))


class PallasRenderer:
    """Drop-in replacement for engine.Renderer using the fused megakernel.

    ``exact_rng``: use the counter-based PCG streams shared with the XLA renderer
    and oracle (identical DRAWS, slower). Defaults to exact off-TPU (so interpret
    tests pin the logic) and the fast hardware PRNG on real TPUs.

    Exactness scope (measured): the PCG streams and the exact Box–Muller ball
    sampler are bit-identical between Mosaic and XLA, but the surrounding
    render arithmetic differs at the ulp level (fma contraction, rsqrt), which
    chaotically flips hit/branch decisions on a small pixel set — on a real
    TPU expect ~95% of pixels to match the XLA renderer to 1e-3 and a mean
    error ~4e-4 at low spp; in CPU interpret mode (same XLA ops) images match
    to ~1e-6. Compare with tolerances, per sample count.
    """

    def __init__(self, config: RenderConfig, exact_rng: Optional[bool] = None):
        self.config = config
        if exact_rng is None:
            exact_rng = jax.default_backend() != "tpu"
        self.exact_rng = exact_rng
        self._fn = _jitted(config, exact_rng)
        self._pscene_cache = None
        self._sl_cache = None
        self._has_emissive = True  # refined per scene in prepare()

    def prepare(self, scene: SceneBuffers) -> PallasScene:
        # Key on every leaf that feeds prepare_pallas_scene (spheres AND
        # materials AND triangles) — a scene reusing sphere arrays with
        # replaced shading data must miss. Leaves are retained because id()
        # values are only unique among live objects.
        from ..kernels.pallas.megakernel import jitted_prepare
        # pscene_cache_key folds in grouping.KD_RULE, so a live rule flip
        # (perf batteries monkeypatch it) misses here and in every other
        # prepared-scene cache — otherwise the new arm silently measures the
        # old arm's tables.
        key, leaves = pscene_cache_key(scene)
        if self._pscene_cache is not None and self._pscene_cache[0] == key:
            return self._pscene_cache[2]
        pscene = jitted_prepare(self.config.pallas_cand_size,
                                self.config.pallas_grouping)(scene)
        # Static layout flag: non-emissive scenes skip the parked radiance
        # planes entirely (megakernel._st_layout). Computed here where the
        # buffers are concrete; cached alongside the prepared scene.
        from ..kernels.pallas.megakernel import scene_has_emissive
        self._has_emissive = scene_has_emissive(scene)
        self._fn = _jitted(self.config, self.exact_rng, self._has_emissive)
        self._pscene_cache = (key, leaves, pscene)
        return pscene

    def shortlists(self, pscene: PallasScene, cam: CameraState):
        """Host-built per-block primary shortlists (+ shortlist-local attr
        tables when every block fits and the scene has no triangles) for
        phase-split bounce 0 (kernels.pallas.primary.shortlists_for) — or
        (None, None, None) when disabled/unworthwhile. Cached on (scene
        tables, camera, config); needs concrete camera values, so it runs
        outside jit."""
        from ..kernels.pallas.primary import device_shortlists_for
        cam_key = tuple(
            float(v) for v in (cam.position.x, cam.position.y, cam.position.z,
                               cam.direction.x, cam.direction.y,
                               cam.direction.z, cam.up.x, cam.up.y, cam.up.z,
                               cam.fov, cam.aspect, cam.aperture,
                               cam.focus_distance))
        key = (self._pscene_cache[0], cam_key)
        if self._sl_cache is not None and self._sl_cache[0] == key:
            return self._sl_cache[1]
        out = device_shortlists_for(pscene, cam, self.config,
                                    self.config.samples_per_pixel)
        self._sl_cache = (key, out)
        return out

    def render(self, scene: SceneBuffers, cam: CameraState, seed: int,
               raster_color: Optional[Vec3] = None,
               raster_depth=None) -> FrameResult:
        if raster_color is None:
            raster_color = Vec3.splat(jnp.float32(1.0))
        if raster_depth is None:
            raster_depth = jnp.float32(0.0)
        pscene = self.prepare(scene)
        sl, slmeta, slattr = self.shortlists(pscene, cam)
        return self._fn(pscene=pscene, cam=cam,
                        frame_seed=jnp.uint32(seed & 0xFFFFFFFF),
                        raster_color=raster_color, raster_depth=raster_depth,
                        sl=sl, slmeta=slmeta, slattr=slattr)
