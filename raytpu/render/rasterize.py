"""Public rasterize API — pure, jittable.

Pixel-major deferred-shading re-design of the reference scanline rasteriser
(`rasteriser/Source/rasteriser.cpp`): see raytpu.ops.raster for the stage
pipeline. Modes follow RenderConfig.mode:

  * 'parity' — scanline-faithful coverage (Bresenham left-pixel skip,
    attribute lag, truncated vertex coords) + CalculateDOF border behavior.
  * 'clean'  — same hard pipeline without the border blanking (the coverage
    quirks are part of the geometry and kept; a float-precise edge-function
    rasterizer lives in the 'soft' path's hard limit).
  * 'soft'   — differentiable edge/z relaxation, raytpu.render.soft.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytpu.core.types import Camera, Lights, RenderConfig, Scene
from raytpu.ops.blur import dof_apply
from raytpu.ops.raster import (
    GBuffer,
    cull_mask,
    pixel_shade,
    resolve_depth,
    row_bounds,
    row_bounds_exact,
    vertex_stage,
)


class RasterOut(NamedTuple):
    image: jax.Array            # (H, W, 3) float32
    focal_distances: jax.Array  # (H, W) float32
    gbuffer: GBuffer


def rasterize_full(scene: Scene, camera: Camera, lights: Lights,
                   cfg: RenderConfig) -> RasterOut:
    """Render a full frame. Compacts the light bank at the host boundary
    (no-op under tracing) so shading cost scales with ACTIVE lights."""
    return _rasterize_full(scene, camera, lights.compact(), cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _rasterize_full(scene: Scene, camera: Camera, lights: Lights,
                    cfg: RenderConfig) -> RasterOut:
    keep = cull_mask(scene, camera, cfg)
    vd = vertex_stage(scene, camera, cfg)
    # Parity replays the reference's float-ACCUMULATED edge walk
    # bit-for-bit; other modes use the closed-form interpolation (same
    # geometry to 1 ulp, no sequential scan).
    bounds = (row_bounds_exact(vd, cfg) if cfg.mode == "parity"
              else row_bounds(vd, cfg))
    g = resolve_depth(bounds, keep, cfg)
    color, fd = pixel_shade(g, scene, camera, lights, cfg)
    img = color.reshape(cfg.height, cfg.width, 3)
    fd = fd.reshape(cfg.height, cfg.width)
    out = dof_apply(img, fd, cfg)
    return RasterOut(image=out, focal_distances=fd, gbuffer=g)


def rasterize(scene: Scene, camera: Camera, lights: Lights,
              cfg: RenderConfig) -> jax.Array:
    """Render and return the (H, W, 3) float32 image."""
    if cfg.mode == "soft":
        from raytpu.render.soft import rasterize_soft

        return jax.jit(rasterize_soft, static_argnames=("cfg",))(
            scene, camera, lights.compact(), cfg
        )
    if cfg.mode == "clean":
        # Float-precise hard rasterization (the soft path's hard limit);
        # 'parity' keeps the reference's scanline truncation quirks.
        from raytpu.render.soft import rasterize_exact

        return jax.jit(rasterize_exact, static_argnames=("cfg",))(
            scene, camera, lights.compact(), cfg
        )
    return rasterize_full(scene, camera, lights, cfg).image
