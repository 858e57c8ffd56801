"""Multi-view rendering — the analog of the reference's per-view render-graph node.

The reference's ``ViewNodeRunner`` runs the raytrace node once per camera/view
(mod.rs:53-60, SURVEY.md C9). Here a ``ViewSet`` renders any number of cameras over
one persistent scene, reusing the compiled frame step across views that share a
config and keeping per-view raster inputs (for the hybrid modes) separate.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from ..core.types import CameraState, RenderConfig, SceneBuffers
from ..core.vec import Vec3
from .renderer import FrameResult, Renderer


@dataclasses.dataclass
class View:
    """One camera's render setup: config + camera state + optional raster layer."""

    name: str
    config: RenderConfig
    camera: CameraState
    raster_color: Optional[Vec3] = None
    raster_depth: Optional[jnp.ndarray] = None


class ViewSet:
    """Render every view against one scene, sharing compiled steps per config."""

    def __init__(self, views: List[View], renderer_cls=Renderer):
        self.views = views
        self._renderers: Dict[RenderConfig, object] = {}
        self._renderer_cls = renderer_cls

    def _renderer(self, config: RenderConfig):
        r = self._renderers.get(config)
        if r is None:
            r = self._renderer_cls(config)
            self._renderers[config] = r
        return r

    def render_all(self, scene: SceneBuffers, seed: int
                   ) -> List[Tuple[str, FrameResult]]:
        out = []
        for i, v in enumerate(self.views):
            frame = self._renderer(v.config).render(
                scene, v.camera, seed=seed + i,
                raster_color=v.raster_color, raster_depth=v.raster_depth)
            out.append((v.name, frame))
        return out
