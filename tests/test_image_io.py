"""BMP codec roundtrip + reading the committed reference render."""

import os

import numpy as np
import pytest

from raytpu.core.image import quantize_u8, read_bmp, write_bmp
from tests.conftest import reference_path


def test_quantize_matches_putpixel_semantics():
    img = np.array([[[-0.5, 0.0, 0.2], [0.999, 1.0, 2.0]]], np.float32)
    q = quantize_u8(img)
    # Uint8(clamp(255*c, 0, 255)) truncates (`SDLauxiliary.h:75-77`).
    np.testing.assert_array_equal(
        q, np.array([[[0, 0, 51], [254, 255, 255]]], np.uint8)
    )


def test_bmp_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    path = str(tmp_path / "x.bmp")
    write_bmp(path, img)
    back = read_bmp(path)
    np.testing.assert_array_equal(back, img)


@pytest.mark.skipif(
    not os.path.exists(reference_path("rasteriser", "screenshot.bmp")),
    reason="reference render not mounted",
)
def test_read_reference_screenshot():
    img = read_bmp(reference_path("rasteriser", "screenshot.bmp"))
    assert img.shape == (500, 500, 3)
    # The Cornell render is dominated by non-black pixels.
    assert (img.sum(axis=-1) > 0).mean() > 0.9
