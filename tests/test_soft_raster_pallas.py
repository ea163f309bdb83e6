"""Fused soft-rasterizer Pallas kernel vs the jnp reference path.

The kernel (raytpu.kernels.soft_raster_pallas) must reproduce
render.soft.rasterize_soft — forward to fp-reassociation tolerance and
gradients (scene vertices/colors, camera pose, light parameters) to
rtol ~1e-4 — including the multi-chunk streaming and pixel-padding
paths. Runs in interpret mode on CPU (tests/conftest.py forces cpu).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.kernels.soft_raster_pallas import rasterize_soft_pallas
from raytpu.render.soft import rasterize_soft

CFG = RenderConfig(width=48, height=40, mode="soft",
                   soft_edge_sharpness=60.0, soft_z_sharpness=60.0)


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box(pad_to=32)
    camera = Camera.rasterizer_default()
    lights = Lights.single(capacity=2)
    return scene, camera, lights


def test_forward_matches_jnp(setup):
    scene, camera, lights = setup
    ref = rasterize_soft(scene, camera, lights, CFG)
    # tile_p=256 forces pixel padding (1920 % 256 != 0); chunk=8 forces
    # 4 triangle chunks through the online-softmax carry.
    out = rasterize_soft_pallas(scene, camera, lights, CFG,
                                tile_p=256, chunk=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_gradients_match_jnp(setup):
    scene, camera, lights = setup

    def loss_ref(s, c, l):
        return jnp.sum(jnp.sin(3.0 * rasterize_soft(s, c, l, CFG)))

    def loss_pal(s, c, l):
        return jnp.sum(jnp.sin(
            3.0 * rasterize_soft_pallas(s, c, l, CFG, tile_p=256, chunk=8)
        ))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(scene, camera, lights)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(scene, camera, lights)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten(g_pal)
    for a, b in zip(flat_r, flat_p):
        a = np.asarray(a)
        b = np.asarray(b)
        assert np.all(np.isfinite(a)), "jnp reference grad not finite"
        assert np.all(np.isfinite(b)), "pallas grad not finite"
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-4)


def test_dispatch_from_rasterize_soft(setup):
    """cfg.use_pallas=True routes rasterize_soft through the kernel."""
    scene, camera, lights = setup
    ref = rasterize_soft(scene, camera, lights,
                         CFG.replace(use_pallas=False))
    out = rasterize_soft(scene, camera, lights,
                         CFG.replace(use_pallas=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_hard_limit_matches_exact(setup):
    """At high sharpness the kernel converges to the hard rasterizer
    (same check the jnp soft path passes)."""
    from raytpu.render.soft import rasterize_exact

    scene, camera, lights = setup
    cfg_sharp = CFG.replace(soft_edge_sharpness=8000.0,
                            soft_z_sharpness=8000.0)
    soft = rasterize_soft_pallas(scene, camera, lights, cfg_sharp)
    hard = rasterize_exact(scene, camera, lights,
                           cfg_sharp.replace(use_pallas=False))
    # Agreement away from edges: median pixel error tiny, mean small.
    d = np.abs(np.asarray(soft) - np.asarray(hard)).max(axis=-1)
    assert np.median(d) < 1e-3
    assert d.mean() < 0.02


def test_zero_triangles_returns_background():
    """T == 0 must still launch one all-invalid chunk (ADVICE r2): a
    zero-length grid dimension never writes the outputs, returning
    garbage where the jnp path returns the background hypothesis."""
    from raytpu.core.types import Scene

    empty = jnp.zeros((0, 3), jnp.float32)
    scene = Scene(v0=empty, v1=empty, v2=empty, color=empty,
                  active=jnp.zeros((0,), jnp.float32))
    camera = Camera.rasterizer_default()
    lights = Lights.single(capacity=2)
    ref = rasterize_soft(scene, camera, lights, CFG)
    out = rasterize_soft_pallas(scene, camera, lights, CFG,
                                tile_p=256, chunk=8)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
