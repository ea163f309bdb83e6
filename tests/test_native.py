"""Native C++ runtime (STL parser, BMP codec) vs the python reference."""

import numpy as np
import pytest

from raytpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_stl_parser_matches_python(tmp_path):
    from tests.test_scene_io import TINY_STL

    path = tmp_path / "t.stl"
    path.write_text(TINY_STL)
    tris = native.parse_stl(str(path))
    from raytpu.core.stl import parse_ascii_stl

    np.testing.assert_array_equal(tris, parse_ascii_stl(TINY_STL))


def test_stl_parser_reference_model():
    import os

    from raytpu.core.stl import REFERENCE_MODEL, load_stl

    if not os.path.exists(REFERENCE_MODEL):
        pytest.skip("reference STL not mounted")
    s_n = load_stl(REFERENCE_MODEL, use_native=True)
    s_p = load_stl(REFERENCE_MODEL, use_native=False)
    np.testing.assert_array_equal(np.asarray(s_n.v0), np.asarray(s_p.v0))
    np.testing.assert_array_equal(np.asarray(s_n.v2), np.asarray(s_p.v2))


def test_stl_parser_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        native.parse_stl(str(tmp_path / "missing.stl"))
    bad = tmp_path / "bad.stl"
    bad.write_text("solid x\n outer loop\n vertex 1 2\n")
    with pytest.raises(ValueError):
        native.parse_stl(str(bad))


def test_bmp_roundtrip_cross_impl(tmp_path):
    from raytpu.core import image as pyimg

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (21, 35, 3), dtype=np.uint8)

    n_path = str(tmp_path / "n.bmp")
    native.write_bmp(n_path, img)
    np.testing.assert_array_equal(pyimg.read_bmp(n_path), img)
    np.testing.assert_array_equal(native.read_bmp(n_path), img)

    p_path = str(tmp_path / "p.bmp")
    pyimg.write_bmp(p_path, img)
    np.testing.assert_array_equal(native.read_bmp(p_path), img)
    # Byte-identical files from both writers.
    assert open(n_path, "rb").read() == open(p_path, "rb").read()
