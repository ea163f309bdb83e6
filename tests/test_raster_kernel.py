"""Fused tile rasterizer kernel vs the jnp exact path (interpret mode).

On TPU hardware the kernel was additionally validated at 512^2 (1.58 ms vs
5.36 ms jnp); a small number of z-tie/coverage-boundary pixels may flip
between the two algebraically-equal formulations there (plane constants
vs direct edge evaluation round differently).
"""

import numpy as np

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.render.soft import rasterize_exact


def _render(use_pallas, size=64):
    scene = cornell_box()
    cam = Camera.make((0.011, -0.007, -3.013), focal=float(size) + 0.23,
                      y_scale=1.01, dof_focus=1.9)
    li = Lights.single(capacity=1)
    cfg = RenderConfig(width=size, height=size, mode="clean",
                       use_pallas=use_pallas)
    return np.asarray(rasterize_exact(scene, cam, li, cfg))


def test_raster_kernel_matches_jnp():
    img_j = _render(False)
    img_p = _render(True)
    np.testing.assert_array_equal(img_j, img_p)


def test_raster_kernel_stl_scene():
    from raytpu.core.stl import load_reference_model

    scene = load_reference_model()
    cam = Camera.make((0.0, -0.5, -5.0), focal=48.0)
    li = Lights.single(capacity=1)
    cfg = RenderConfig(width=48, height=48, mode="clean", use_pallas=True)
    img = np.asarray(rasterize_exact(scene, cam, li, cfg))
    assert np.isfinite(img).all()
    frac = (img.sum(-1) > 1e-3).mean()
    assert 0.001 < frac < 0.2  # small model, mostly background


def test_blk8_winner_matches_row_kernel():
    """The round-5 (8, tile/8) single-chunk winner path must be
    bit-identical to the (C, P) row-layout kernel (forced via a smaller
    tri_chunk -> multi-chunk grid). Also verified on chip: 0/65536
    mismatches at 256^2."""
    import jax.numpy as jnp

    from raytpu.kernels.raster_pallas import (
        raster_tri_constants,
        resolve_winner_pallas,
    )
    from raytpu.ops.raster import cull_mask
    from raytpu.render.soft import _screen_vertices

    scene = cornell_box(pad_to=32)
    cam = Camera.rasterizer_default()
    cfg = RenderConfig(width=40, height=40, mode="clean")
    sx, sy, zinv, _ = _screen_vertices(scene, cam, cfg)
    keep = cull_mask(scene, cam, cfg.replace(frustum_cull=False))
    consts = raster_tri_constants(sx, sy, zinv, keep)
    ys, xs = jnp.meshgrid(
        jnp.arange(40, dtype=jnp.float32),
        jnp.arange(40, dtype=jnp.float32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    w_blk8 = np.asarray(
        resolve_winner_pallas(px, py, consts, tile_p=256))
    w_rows = np.asarray(
        resolve_winner_pallas(px, py, consts, tile_p=256, tri_chunk=16))
    np.testing.assert_array_equal(w_blk8, w_rows)
