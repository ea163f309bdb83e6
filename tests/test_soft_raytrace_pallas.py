"""Fused soft-raytracer Pallas kernels vs the jnp reference path.

raytpu.kernels.soft_raytrace_pallas must reproduce
render.soft.raytrace_soft — forward to fp tolerance, gradients to
rtol ~1e-4 — including multi-chunk streaming, ray padding, multi-light
and jittered soft-shadow sources. Interpret mode on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.kernels.soft_raytrace_pallas import raytrace_soft_pallas
from raytpu.render.soft import raytrace_soft

CFG = RenderConfig(width=48, height=40, mode="soft",
                   soft_edge_sharpness=60.0, soft_z_sharpness=60.0,
                   use_pallas=False)


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box(pad_to=32)
    camera = Camera.raytracer_default()
    lights = Lights.single(capacity=2)
    return scene, camera, lights


def test_forward_matches_jnp(setup):
    scene, camera, lights = setup
    ref = raytrace_soft(scene, camera, lights, CFG)
    out = raytrace_soft_pallas(scene, camera, lights, CFG,
                               tile_p=256, chunk=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_forward_matches_jnp_soft_shadows(setup):
    """Jittered multi-sample shadow sources (`raytracer.cpp:272-296`)."""
    scene, camera, lights = setup
    cfg = CFG.replace(soft_shadow_samples=4)
    ref = raytrace_soft(scene, camera, lights, cfg)
    out = raytrace_soft_pallas(scene, camera, lights, cfg,
                               tile_p=256, chunk=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_gradients_match_jnp(setup):
    scene, camera, lights = setup

    def loss_ref(s, c, l):
        return jnp.sum(jnp.sin(3.0 * raytrace_soft(s, c, l, CFG)))

    def loss_pal(s, c, l):
        return jnp.sum(jnp.sin(
            3.0 * raytrace_soft_pallas(s, c, l, CFG, tile_p=256, chunk=8)
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


def test_dispatch_from_raytrace_soft(setup):
    """cfg.use_pallas=True routes raytrace_soft through the kernels."""
    scene, camera, lights = setup
    ref = raytrace_soft(scene, camera, lights, CFG)
    out = raytrace_soft(scene, camera, lights,
                        CFG.replace(use_pallas=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_zero_triangles_returns_background():
    """T == 0 launches one all-invalid chunk (ADVICE r2) instead of a
    zero-length grid that leaves the outputs unwritten."""
    from raytpu.core.types import Scene

    empty = jnp.zeros((0, 3), jnp.float32)
    scene = Scene(v0=empty, v1=empty, v2=empty, color=empty,
                  active=jnp.zeros((0,), jnp.float32))
    camera = Camera.raytracer_default()
    lights = Lights.single(capacity=2)
    ref = raytrace_soft(scene, camera, lights, CFG)
    out = raytrace_soft_pallas(scene, camera, lights, CFG,
                               tile_p=256, chunk=8)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
