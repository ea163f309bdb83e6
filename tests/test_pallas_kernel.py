"""Fused Pallas closest-hit kernel vs the jnp path (interpret mode on CPU).

The TPU-compiled kernel is additionally validated bit-exact on hardware
(0 index mismatches / 0 t-diff for Cornell and the 9k-triangle STL scene;
see kernels/intersect_pallas.py and the benchmark logs).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig, Scene
from raytpu.ops.intersect import intersect, tri_constants
from raytpu.render.raytrace import (
    camera_ray_dirs,
    pixel_grid,
    raytrace_full,
)


def _dirs_and_consts(size=32, pad_to=None):
    scene = cornell_box(pad_to=pad_to)
    cam = Camera.raytracer_default()
    cfg = RenderConfig(width=size, height=size)
    xs, ys = pixel_grid(cfg)
    dirs = camera_ray_dirs(xs, ys, cam, cfg)
    return scene, cam, dirs, tri_constants(scene, cam.pos)


def test_forward_matches_jnp():
    _, _, dirs, consts = _dirs_and_consts()
    h_j = intersect(dirs, consts)
    h_p = intersect(dirs, consts, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(h_j.idx), np.asarray(h_p.idx))
    # On TPU the two paths are bit-equal (identical VPU FMA chains —
    # verified 0 t-diffs on hardware, bench/check_exact.py). Under CPU
    # interpret mode XLA's fused mul-add contraction differs from the
    # op-by-op interpreter by 1 ulp, so t gets a tolerance here.
    np.testing.assert_allclose(
        np.asarray(h_j.t), np.asarray(h_p.t), rtol=5e-7
    )


def test_forward_matches_jnp_padded_scene():
    """Padded (inactive) triangles and non-tile-multiple chunking."""
    _, _, dirs, consts = _dirs_and_consts(pad_to=200)  # not 128-aligned
    h_j = intersect(dirs, consts)
    h_p = intersect(dirs, consts, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(h_j.idx), np.asarray(h_p.idx))


def test_vjp_matches_jnp():
    scene, cam, _, _ = _dirs_and_consts()
    lights = Lights.single(capacity=1)
    w = jnp.asarray(
        np.random.default_rng(0).normal(size=(32, 32, 3)), jnp.float32
    )

    def loss(v0, use_pallas):
        s2 = dataclasses.replace(scene, v0=v0)
        cfg = RenderConfig(width=32, height=32, mode="clean",
                           use_pallas=use_pallas)
        return jnp.sum(raytrace_full(s2, cam, lights, cfg).image * w)

    g_j = jax.grad(lambda v: loss(v, False))(scene.v0)
    g_p = jax.grad(lambda v: loss(v, True))(scene.v0)
    np.testing.assert_allclose(
        np.asarray(g_j), np.asarray(g_p), rtol=1e-4, atol=1e-4
    )


def test_fused_occlusion_matches_separate():
    """closest_hit_occluded == (closest_hit, jnp shadow test) — the fused
    two-phase kernel must agree with the separate path on t, idx, AND the
    occlusion bit."""
    from raytpu.kernels.intersect_pallas import intersect_occluded_pallas
    from raytpu.ops.intersect import hit_positions, intersect_scene

    scene, cam, dirs, consts = _dirs_and_consts()
    lights = Lights.single(capacity=1)
    lpos = lights.position[0]
    consts_l = tri_constants(scene, lpos)

    hits_f, occ_f = intersect_occluded_pallas(
        dirs, consts, consts_l, cam.pos, lpos
    )
    hits_j = intersect(dirs, consts)
    pos = hit_positions(cam.pos, dirs, hits_j)
    delta = pos - lpos[None, :]
    sh = intersect_scene(lpos, delta, scene)
    occ_j = np.asarray(sh.hit & (sh.t < 0.99))

    np.testing.assert_array_equal(np.asarray(hits_j.idx),
                                  np.asarray(hits_f.idx))
    np.testing.assert_allclose(np.asarray(hits_j.t),
                               np.asarray(hits_f.t), rtol=5e-7)
    occ_f = np.asarray(occ_f)
    # Interpret-mode FMA contraction can flip an occlusion bit only when
    # an occluder sits at exactly 99% of the light distance — none in the
    # Cornell box; require exact agreement.
    np.testing.assert_array_equal(occ_j, occ_f)
    assert occ_j.any() and not occ_j.all()  # shadows present, not trivial


def test_fused_render_matches_unfused():
    """raytrace_full's fused fast path == the separate-kernels render."""
    scene = cornell_box()
    cam = Camera.raytracer_default()
    lights = Lights.single(capacity=1)
    cfg_f = RenderConfig(width=32, height=32, mode="clean", use_pallas=True)
    # capacity=2 disables the fused path but shades identically with one
    # active light in clean mode.
    lights2 = Lights.single(capacity=2)
    img_f = raytrace_full(scene, cam, lights, cfg_f).image
    img_s = raytrace_full(scene, cam, lights2, cfg_f).image
    np.testing.assert_allclose(
        np.asarray(img_f), np.asarray(img_s), atol=1e-6
    )


def test_fused_multi_occlusion_matches_separate():
    """closest_hit_occluded_multi: t/idx match the plain closest hit and
    every source's occlusion row matches a separate jnp shadow trace."""
    from raytpu.kernels.intersect_pallas import (
        intersect_occluded_multi_pallas,
    )
    from raytpu.ops.intersect import hit_positions, intersect_scene

    scene, cam, dirs, consts = _dirs_and_consts()
    lights = Lights.single(capacity=2, soft_samples=4).add(
        (0.4, 0.4, -0.6), (1.0, 0.8, 0.6), 8.0, key=jax.random.PRNGKey(7)
    )
    n_s = 4
    src_pos = lights.jitter[:, :n_s].reshape(-1, 3)  # (8, 3)
    consts_src = jax.vmap(lambda o: tri_constants(scene, o))(src_pos)

    hits_f, occ_f = intersect_occluded_multi_pallas(
        dirs, consts, consts_src, cam.pos, src_pos
    )
    hits_j = intersect(dirs, consts)
    np.testing.assert_array_equal(np.asarray(hits_j.idx),
                                  np.asarray(hits_f.idx))
    np.testing.assert_allclose(np.asarray(hits_j.t),
                               np.asarray(hits_f.t), rtol=5e-7)

    pos = hit_positions(cam.pos, dirs, hits_j)
    occ_f = np.asarray(occ_f)
    assert occ_f.shape == (8, dirs.shape[0])
    for s in range(src_pos.shape[0]):
        delta = pos - src_pos[s][None, :]
        sh = intersect_scene(src_pos[s], delta, scene)
        occ_j = np.asarray(sh.hit & (sh.t < 0.99))
        np.testing.assert_array_equal(occ_j, occ_f[s], err_msg=f"src {s}")
    assert occ_f.any() and not occ_f.all()


def test_fused_multi_render_matches_unfused():
    """Soft-shadow + multi-light render: the fused multi-source path must
    match the separate-launch jnp path."""
    scene = cornell_box()
    cam = Camera.raytracer_default()
    lights = Lights.single(capacity=2, soft_samples=4).add(
        (0.4, 0.4, -0.6), (1.0, 0.8, 0.6), 8.0, key=jax.random.PRNGKey(7)
    )
    for cfg_kw in (
        dict(soft_shadow_samples=4),          # soft shadows, multi-light
        dict(),                               # hard shadows, multi-light
    ):
        cfg_p = RenderConfig(width=24, height=24, mode="clean",
                             use_pallas=True, **cfg_kw)
        cfg_j = dataclasses.replace(cfg_p, use_pallas=False)
        img_p = raytrace_full(scene, cam, lights, cfg_p).image
        img_j = raytrace_full(scene, cam, lights, cfg_j).image
        np.testing.assert_allclose(
            np.asarray(img_j), np.asarray(img_p), atol=1e-6,
            err_msg=str(cfg_kw),
        )


def test_fused_multi_vjp_matches_jnp():
    """Gradients through the multi-source fused path (soft shadows)."""
    scene, cam, _, _ = _dirs_and_consts()
    lights = Lights.single(capacity=1, soft_samples=4)
    w = jnp.asarray(
        np.random.default_rng(1).normal(size=(16, 16, 3)), jnp.float32
    )

    def loss(v0, use_pallas):
        s2 = dataclasses.replace(scene, v0=v0)
        cfg = RenderConfig(width=16, height=16, mode="clean",
                           soft_shadow_samples=4, use_pallas=use_pallas)
        return jnp.sum(raytrace_full(s2, cam, lights, cfg).image * w)

    g_j = jax.grad(lambda v: loss(v, False))(scene.v0)
    g_p = jax.grad(lambda v: loss(v, True))(scene.v0)
    np.testing.assert_allclose(
        np.asarray(g_j), np.asarray(g_p), rtol=1e-4, atol=1e-4
    )


def test_full_render_image_identical():
    scene = cornell_box()
    cam = Camera.raytracer_default()
    lights = Lights.single(capacity=1)
    img_j = raytrace_full(
        scene, cam, lights, RenderConfig(width=32, height=32)
    ).image
    img_p = raytrace_full(
        scene, cam, lights,
        RenderConfig(width=32, height=32, use_pallas=True),
    ).image
    # Round 4: the headline path is the fully-fused megakernel
    # (kernels/render_fused.py) whose SHADING runs in-kernel — the image
    # matches the XLA path to fp reassociation (~1 ulp), while the
    # winner/occlusion bits stay BIT-exact (tests/test_render_fused.py
    # pins that; it is the part that catches miscompiles).
    np.testing.assert_allclose(
        np.asarray(img_j), np.asarray(img_p), atol=5e-7
    )


def test_parity_aa_fused_matches_unfused():
    """Parity-AA now runs fused (VERDICT round-1 item 5b): the occlusion
    bits carried with the intersection record must make the fused render
    bit-identical to the unfused parity path — single-light (fused) and
    multi-light/soft-shadow (fused_multi) variants."""
    scene = cornell_box()
    cam = Camera.raytracer_default()
    for lights, samples in (
        (Lights.single(capacity=1), 1),   # fused single-source path
        (Lights.single(capacity=2), 1),   # fused_multi path
        (Lights.single(capacity=1), 4),   # fused_multi, jittered sources
    ):
        cfg_p = RenderConfig(width=32, height=32, mode="parity",
                             aa_samples=3, soft_shadow_samples=samples,
                             use_pallas=True)
        cfg_x = cfg_p.replace(use_pallas=False)
        img_f = raytrace_full(scene, cam, lights, cfg_p).image
        img_x = raytrace_full(scene, cam, lights, cfg_x).image
        np.testing.assert_array_equal(np.asarray(img_f), np.asarray(img_x))
