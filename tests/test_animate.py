"""Frame-sequence driver (raytpu.render.animate) — the realtime-loop
analog (R9 closure; `raytracer.cpp:346-423`, `rasteriser.cpp:330-373`)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.render.animate import (
    animate,
    apply_key_raytracer,
    apply_key_rasterizer,
    expand_script,
    realtime_preset,
)


def test_expand_script():
    assert expand_script("left*3,up, w*2") == [
        "left", "left", "left", "up", "w", "w"
    ]
    with pytest.raises(ValueError):
        expand_script("q*2")


def test_raytracer_motion_semantics():
    """Fixed 0.1 steps along the rotation columns
    (`raytracer.cpp:346-423`); light motion shifts the jitter bank."""
    cam = Camera.raytracer_default()
    li = Lights.single(capacity=1)

    c2, _ = apply_key_raytracer(cam, li, "up")
    # yaw 0 -> forward = (0, 0, 1).
    np.testing.assert_allclose(np.asarray(c2.pos) - np.asarray(cam.pos),
                               [0.0, 0.0, 0.1], atol=1e-7)
    c3, _ = apply_key_raytracer(cam, li, "left")
    assert float(c3.yaw) == pytest.approx(0.1)

    _, l2 = apply_key_raytracer(cam, li, "d")
    delta = np.asarray(l2.position[0]) - np.asarray(li.position[0])
    np.testing.assert_allclose(delta, [0.1, 0.0, 0.0], atol=1e-7)
    jd = np.asarray(l2.jitter[0]) - np.asarray(li.jitter[0])
    np.testing.assert_allclose(jd, np.broadcast_to(delta, jd.shape),
                               atol=1e-7)


def test_rasterizer_motion_dt_scaling():
    """dt/20 scaling on world axes (`rasteriser.cpp:330-373`)."""
    cam = Camera.rasterizer_default()
    li = Lights.single(capacity=1)
    _, l2 = apply_key_rasterizer(cam, li, "w", dt_ms=40.0)
    delta = np.asarray(l2.position[0]) - np.asarray(li.position[0])
    np.testing.assert_allclose(delta, [0.0, 0.0, 0.1], atol=1e-7)
    c2, _ = apply_key_rasterizer(cam, li, "left", dt_ms=40.0)
    assert float(c2.yaw) == pytest.approx(0.02)


def test_animate_renders_sequence(tmp_path):
    scene = cornell_box(pad_to=32)
    camera, cfg = realtime_preset()
    cfg = RenderConfig(width=32, height=32, mode="parity")
    lights = Lights.single(capacity=1)
    res = animate(scene, camera, lights, cfg,
                  ["left", "left", "up", "w"],
                  renderer="raytrace", out_dir=str(tmp_path),
                  save_every=2)
    assert res.n_frames == 4
    assert res.fps > 0
    assert len(res.paths) == 2
    for p in res.paths:
        assert os.path.exists(p)
    # Motion must actually change the image.
    from raytpu.core.image import read_bmp

    a = read_bmp(res.paths[0])
    b = read_bmp(res.paths[1])
    assert (a != b).any()


def test_realtime_preset_matches_reference():
    camera, cfg = realtime_preset()
    assert (cfg.width, cfg.height) == (150, 150)
    assert float(camera.focal) == 250.0
    np.testing.assert_allclose(np.asarray(camera.pos), [0.0, 0.0, -4.3])
