"""Structural parity against the committed reference render.

`rasteriser/screenshot.bmp` (500x500) is the only ground-truth image in the
reference tree. Analysis shows it was saved by an EARLIER build of the
reference than the committed source:

  * Its border pattern (only column x=0 black; rows 0/499 drawn) matches a
    build where Draw wrote pixels directly — current source routes through
    CalculateDOF which skips x,y in {0, S-1} (`rasteriser.cpp:491-493`).
    The black x=0 column is the scanline left-pixel skip (`:651-653`).
  * Its ceiling is ambient-only while current-source normals light it.
  * Its white-wall level (u8 23) is below the current ambient floor
    (0.2 * 0.75 -> u8 38) — the old build used different lighting constants.

Pixel-exact comparison against current source is therefore impossible; the
bit-exact anchor for current-source behavior is the numpy oracle
(raytpu.oracle.rasterizer_oracle). Against the screenshot we assert
GEOMETRY parity: per-region dominant-color-class agreement >= 97%, which
pins the projection, culling, coverage and depth ordering.
"""

import numpy as np
import pytest

from raytpu.core.cornell import cornell_box_numpy
from raytpu.core.image import quantize_u8, read_bmp
from tests.conftest import reference_path

SCREENSHOT = reference_path("rasteriser", "screenshot.bmp")


def _classify(c):
    r, g, b = c / 255.0
    if r + g + b < 0.02:
        return "."
    if abs(r - g) < 0.04 and abs(g - b) < 0.04:
        return "W"
    if g > r and g > b:
        return "G"
    if r > g and b > g and abs(r - b) < 0.1:
        return "P"
    if b > r and b > g:
        return "B"
    if g > r and b > r:
        return "C"
    if r > g and r > b:
        return "R"
    if r > b and g > b:
        return "Y"
    return "?"


def _class_map(img, stride=10):
    return [
        [_classify(img[y, x].astype(float)) for x in range(0, 500, stride)]
        for y in range(0, 500, stride)
    ]


@pytest.mark.slow
def test_oracle_matches_screenshot_geometry():
    from raytpu.oracle.rasterizer_oracle import render

    ref = read_bmp(SCREENSHOT)
    _, _, raw = render(cornell_box_numpy())  # pre-CalculateDOF buffer
    mine = quantize_u8(raw)
    a = np.array(_class_map(mine))
    b = np.array(_class_map(ref))
    agreement = (a == b).mean()
    assert agreement >= 0.97, f"class agreement {agreement:.4%}"


@pytest.mark.slow
def test_jax_rasterizer_matches_screenshot_geometry():
    import jax

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.ops.raster import (
        cull_mask, pixel_shade, resolve_depth, row_bounds, vertex_stage,
    )

    scene = cornell_box()
    cam = Camera.rasterizer_default()
    lights = Lights.single(capacity=1)
    cfg = RenderConfig(width=500, height=500)
    keep = cull_mask(scene, cam, cfg)
    g = resolve_depth(row_bounds(vertex_stage(scene, cam, cfg), cfg), keep,
                      cfg)
    color, _ = pixel_shade(g, scene, cam, lights, cfg)
    mine = quantize_u8(np.asarray(color).reshape(500, 500, 3))
    ref = read_bmp(SCREENSHOT)
    a = np.array(_class_map(mine))
    b = np.array(_class_map(ref))
    agreement = (a == b).mean()
    assert agreement >= 0.97, f"class agreement {agreement:.4%}"
