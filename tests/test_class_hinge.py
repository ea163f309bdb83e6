"""bench/fit_reference.py's class-margin hinge (the metric-aligned fit
polish loss).

The hinge claims two properties this file pins down:

  soundness   — a sampled pixel with ZERO hinge loss classifies as its
                reference class under the metric's _classify decision
                list (so driving the hinge to 0 drives the metric to 1);
  targeting   — on the real reference screenshot the hinge is exactly 0,
                and on a fitted render every metric-DISAGREEING cell has
                an active (gradient-carrying) hinge, so the optimizer
                feels each disagreement directly.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "bench"))

from fit_reference import _class_grid, _classify, make_class_hinge  # noqa: E402
from raytpu.core.image import read_bmp  # noqa: E402
from tests.conftest import reference_path  # noqa: E402

SCREENSHOT = reference_path("rasteriser", "screenshot.bmp")
FITTED = os.path.join(os.path.dirname(__file__), "..", "results",
                      "fit_reference", "fitted.bmp")


def _grad_active_cells(hinge, img_f32):
    """Cells whose sampled pixel carries hinge gradient (== active hinge:
    every violated margin term is piecewise linear with nonzero slope)."""
    g = jax.grad(hinge)(img_f32)
    return np.asarray(np.abs(g).sum(-1)[::10, ::10] > 0)


@pytest.mark.skipif(not os.path.exists(SCREENSHOT),
                    reason="reference screenshot unavailable")
def test_hinge_zero_on_reference():
    ref = read_bmp(SCREENSHOT)
    hinge = make_class_hinge(_class_grid(ref), weight=1.0)
    val = float(hinge(ref.astype(np.float32) / 255.0))
    assert val == 0.0


@pytest.mark.skipif(
    not (os.path.exists(SCREENSHOT) and os.path.exists(FITTED)),
    reason="committed fit artifact unavailable")
def test_hinge_active_on_every_disagreeing_cell():
    ref = read_bmp(SCREENSHOT)
    fit = read_bmp(FITTED)
    refg = _class_grid(ref)
    hinge = make_class_hinge(refg, weight=1.0)
    x = np.asarray(fit, np.float32) / 255.0
    assert float(hinge(x)) > 0.0
    active = _grad_active_cells(hinge, x)
    disagree = refg != _class_grid(fit)
    # Completeness on real data: no disagreeing cell is invisible to the
    # hinge (the failure mode of the plain chroma loss).
    missed = disagree & ~active
    assert missed.sum() == 0, f"{missed.sum()} disagreeing cells inactive"


@pytest.mark.parametrize("cls", [".", "W", "G", "B", "R", "P", "C", "Y"])
def test_hinge_soundness_fuzz(cls):
    """Zero hinge at a sampled pixel => _classify returns the target
    class. Colors are drawn on the u8 grid (what quantize_u8 feeds the
    metric), so the equality bands (|a-b| <= 0.0015 < 1/255) imply exact
    u8 channel equality."""
    rng = np.random.default_rng(ord(cls))
    n = 50 * 50
    # Mix uniform colors with near-class colors so each class gets
    # plenty of zero-hinge samples, plus exact-equality structured draws
    # for C/Y/W.
    u8 = rng.integers(0, 256, size=(n, 3)).astype(np.float64)
    if cls in ("C", "Y", "W", "."):
        a = rng.integers(0, 256, size=n)
        b = rng.integers(0, 256, size=n)
        if cls == "C":
            u8[n // 2:] = np.stack([b, a, a], -1)[n // 2:]
        elif cls == "Y":
            u8[n // 2:] = np.stack([a, a, b], -1)[n // 2:]
        elif cls == "W":
            u8[n // 2:] = np.stack([a, a, a], -1)[n // 2:]
        else:
            u8[n // 2:] = rng.integers(0, 3, size=(n, 3))[n // 2:]
    ref_classes = np.full((50, 50), cls)
    hinge = make_class_hinge(ref_classes, weight=1.0)
    img = np.zeros((500, 500, 3), np.float32)
    img[::10, ::10] = (u8 / 255.0).reshape(50, 50, 3)
    active = _grad_active_cells(hinge, img)
    colors = u8.reshape(50, 50, 3)
    checked = 0
    for y, x in zip(*np.nonzero(~active)):
        assert _classify(colors[y, x]) == cls, (
            f"zero-hinge color {colors[y, x]} classifies as "
            f"{_classify(colors[y, x])!r}, wanted {cls!r}")
        checked += 1
    assert checked > 0, "fuzz produced no zero-hinge samples"


@pytest.mark.parametrize("cls", [".", "W", "G", "B", "R", "P"])
def test_hinge_soundness_offgrid_fuzz(cls):
    """Truncation soundness: quantize_u8 TRUNCATES (C++ float->int), so
    a float value can lose up to 1/255 per channel before the metric
    sees it. For the inequality-defined classes the margins carry that
    slack: zero hinge at an arbitrary FLOAT pixel => the truncated u8
    pixel classifies as the target class. (The equality classes C/Y are
    excluded: a float near-tie can straddle a truncation boundary —
    their soundness requires exact channel equality, the structural
    case the fit preserves by freezing channel-equal colors.)"""
    from raytpu.core.image import quantize_u8

    rng = np.random.default_rng(1000 + ord(cls))
    n = 50 * 50
    cols = rng.uniform(0.0, 1.0, size=(n, 3))
    if cls == ".":
        cols[n // 2:] = rng.uniform(0.0, 0.03, size=(n, 3))[n // 2:]
    elif cls == "W":
        base = rng.uniform(0.1, 1.0, size=n)
        cols[n // 2:] = (base[:, None]
                         + rng.uniform(-0.02, 0.02, size=(n, 3)))[n // 2:]
    ref_classes = np.full((50, 50), cls)
    hinge = make_class_hinge(ref_classes, weight=1.0)
    img = np.zeros((500, 500, 3), np.float32)
    img[::10, ::10] = np.clip(cols, 0.0, 1.0).reshape(50, 50, 3)
    active = _grad_active_cells(hinge, img)
    u8 = np.asarray(quantize_u8(img))[::10, ::10]
    checked = 0
    for y, x in zip(*np.nonzero(~active)):
        got = _classify(u8[y, x].astype(float))
        assert got == cls, (
            f"zero-hinge float {img[y*10, x*10]} truncates to "
            f"{u8[y, x]} which classifies {got!r}, wanted {cls!r}")
        checked += 1
    assert checked > 0, "off-grid fuzz produced no zero-hinge samples"
