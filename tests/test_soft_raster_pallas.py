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


def test_culled_matches_unculled():
    """Chunk culling (soft_keep_mask) must not change the soft image or
    its gradients beyond the ~1e-20 relative mass it provably drops —
    multi-chunk STL geometry, 2D-blocked pixel tiles."""
    import dataclasses

    from raytpu.core.stl import load_reference_model
    from raytpu.kernels.soft_raster_pallas import (
        rasterize_soft_pallas,
        soft_keep_mask,
        soft_tri_constants,
    )

    full = load_reference_model()
    sub = jax.tree_util.tree_map(lambda a: a[:64], full)
    cam = Camera.make((0.7207, 0.0527, 0.2441), yaw=0.003, focal=200.37)
    lights = Lights.single(capacity=1)
    cfg = RenderConfig(width=64, height=64, mode="soft",
                       soft_edge_sharpness=10.0, soft_z_sharpness=20.0)

    ref = rasterize_soft_pallas(sub, cam, lights, cfg, chunk=16,
                                cull=False)
    out = rasterize_soft_pallas(sub, cam, lights, cfg, chunk=16,
                                cull=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)

    # The mask must actually cull something on this tiny-on-screen model.
    from raytpu.render.soft import _screen_vertices

    sx, sy, zinv, pos3d = _screen_vertices(sub, cam, cfg)
    consts = soft_tri_constants(sx, sy, zinv, pos3d, sub.color,
                                sub.normals(), sub.active)
    coords = np.stack(np.meshgrid(np.arange(64.0), np.arange(64.0),
                                  indexing="xy"), 0).reshape(2, -1)
    mask = soft_keep_mask(jnp.asarray(coords.astype(np.float32)),
                          consts, 10.0, 20.0, 1024, 16)
    assert float(jnp.mean(mask)) < 0.9, "mask culled nothing"

    # Gradients agree too (both kernels, same vjp under the mask).
    def loss(v0, cull):
        s2 = dataclasses.replace(sub, v0=v0)
        return jnp.sum(
            rasterize_soft_pallas(s2, cam, lights, cfg, chunk=16,
                                  cull=cull) ** 2)

    g_ref = jax.grad(lambda v: loss(v, False))(sub.v0)
    g_cul = jax.grad(lambda v: loss(v, True))(sub.v0)
    scale = max(float(jnp.abs(g_ref).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(g_cul) / scale,
                               np.asarray(g_ref) / scale, atol=1e-5)
