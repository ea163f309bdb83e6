"""Grad-safety regression: finite gradients when a light sits EXACTLY on a
surface point (r = 0 in the inverse-square falloff).

CLAUDE.md invariant: guard every division/sqrt whose operand can be 0 even
when the result is masked — `where` does NOT stop NaN cotangents. Mid-fit,
an optimized light crossing a surface would otherwise NaN the whole run
(VERDICT round 1, weak #2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.ops.intersect import hit_positions, intersect, tri_constants
from raytpu.render.raytrace import camera_ray_dirs, pixel_grid, raytrace_full

SIZE = 16


def _all_finite(tree) -> bool:
    return all(
        bool(jnp.all(jnp.isfinite(leaf)))
        for leaf in jax.tree_util.tree_leaves(tree)
    )


def _light_on_surface():
    """Lights bank whose single light sits bitwise-exactly on the hit
    position of one rendered pixel."""
    scene = cornell_box()
    cam = Camera.make((0.0137, 0.0071, -2.0213), focal=float(SIZE) / 2.0)
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="clean")
    xs, ys = pixel_grid(cfg)
    dirs = camera_ray_dirs(xs, ys, cam, cfg)
    hits = intersect(dirs, tri_constants(scene, cam.pos), 512)
    pos = hit_positions(cam.pos, dirs, hits)
    p = pos[SIZE * (SIZE // 2) + SIZE // 2]  # center pixel's surface point
    lights = Lights.single(position=np.asarray(p), capacity=1)
    # add() jitters around the position; pin slot 0's position exactly.
    lights = Lights(
        position=lights.position.at[0].set(p),
        color=lights.color, intensity=lights.intensity,
        mask=lights.mask, jitter=lights.jitter,
    )
    return scene, cam, lights, cfg


def test_hard_raytrace_finite_grads_light_on_surface():
    scene, cam, lights, cfg = _light_on_surface()

    def loss(l, s):
        return jnp.mean(raytrace_full(s, cam, l, cfg).image)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(lights, scene)
    assert jnp.isfinite(val)
    assert _all_finite(grads)


def test_soft_raytrace_finite_grads_light_on_surface():
    from raytpu.render.soft import raytrace_soft

    scene, cam, lights, cfg0 = _light_on_surface()
    cfg = cfg0.replace(mode="soft", soft_edge_sharpness=20.0,
                       soft_z_sharpness=20.0)

    def loss(l, s):
        return jnp.mean(raytrace_soft(s, cam, l, cfg))

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(lights, scene)
    assert jnp.isfinite(val)
    assert _all_finite(grads)


def test_irradiance_finite_grads_light_on_point():
    """irradiance_no_shadow (rasterizer/soft shading term) with the light
    bitwise-equal to a shaded world point."""
    from raytpu.ops.shade import irradiance_no_shadow

    world = jnp.asarray([[0.1, -0.2, 0.3], [0.0, -0.5, -0.7]], jnp.float32)
    n_dir = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]], jnp.float32)
    lights = Lights.single(capacity=1)  # light == world[1] exactly

    def loss(l):
        return jnp.sum(irradiance_no_shadow(world, n_dir, l))

    val, g = jax.value_and_grad(loss)(lights)
    assert jnp.isfinite(val)
    assert _all_finite(g)


def test_soft_shadow_factor_finite_grads_light_on_point():
    from raytpu.render.soft import _soft_shadow_factor

    scene = cornell_box()
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="soft")
    world = jnp.asarray([[0.0, -0.5, -0.7], [0.2, 0.1, 0.4]], jnp.float32)
    lights = Lights.single(capacity=1)  # light == world[0] exactly

    def loss(l, s):
        return jnp.sum(_soft_shadow_factor(world, s, l, cfg))

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(lights, scene)
    assert jnp.isfinite(val)
    assert _all_finite(grads)


def test_rasterize_finite_grads_light_on_surface():
    """Hard rasterizer pixel_shade with the light exactly on a visible
    surface point (reconstructed from the gbuffer)."""
    from raytpu.render.rasterize import rasterize_full

    scene = cornell_box()
    cam = Camera.make((0.011, -0.007, -3.013), focal=float(SIZE),
                      y_scale=1.01, dof_focus=1.9)
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="clean")
    # Reconstruct the center pixel's world position the same way
    # pixel_shade does, so the light lands on it bitwise.
    from raytpu.ops.raster import glm_inverse3

    out = rasterize_full(scene, cam, Lights.single(capacity=1), cfg)
    g = out.gbuffer
    i = SIZE * (SIZE // 2) + SIZE // 2
    inv_rot = glm_inverse3(cam.rotation())
    world = jnp.matmul(
        g.pos3d[i] / g.zinv[i], inv_rot,
        precision=jax.lax.Precision.HIGHEST,
    ) + cam.pos
    lights = Lights.single(capacity=1)
    lights = Lights(
        position=lights.position.at[0].set(world),
        color=lights.color, intensity=lights.intensity,
        mask=lights.mask, jitter=lights.jitter,
    )

    def loss(l, s):
        return jnp.mean(rasterize_full(s, cam, l, cfg).image)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(lights, scene)
    assert jnp.isfinite(val)
    assert _all_finite(grads)
