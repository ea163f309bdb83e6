"""Tests for the fully-fused hard render kernel (kernels/render_fused.py).

The megakernel replaces the intersect-kernel + XLA-epilogue split on the
headline path; these tests pin (a) image/fd equality with the XLA clean
and parity paths, (b) bit-exact idx/occ vs the 2-phase fused kernel it
subsumes, and (c) gradient agreement with the XLA path end-to-end.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.render.raytrace import raytrace_full


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box(pad_to=32)
    lights = Lights.single(capacity=1)
    cam = Camera.raytracer_default()
    return scene, lights, cam


@pytest.mark.parametrize("mode", ["clean", "parity"])
def test_image_matches_xla(setup, mode):
    scene, lights, cam = setup
    cfg = RenderConfig(width=32, height=32, mode=mode, use_pallas=True,
                       megakernel=True)
    out_m = raytrace_full(scene, cam, lights, cfg)
    out_x = raytrace_full(
        scene, cam, lights,
        dataclasses.replace(cfg, use_pallas=False, megakernel=False),
    )
    np.testing.assert_allclose(
        np.asarray(out_m.image), np.asarray(out_x.image), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_m.focal_distances),
        np.asarray(out_x.focal_distances),
        atol=1e-6,
    )


def test_idx_occ_bit_exact_vs_two_phase(setup):
    """The megakernel's winner/occlusion must be bit-identical to the
    2-phase fused kernel (same _chunk_tuv math, same tie-break)."""
    from raytpu.kernels.intersect_pallas import closest_hit_occluded
    from raytpu.kernels.render_fused import _call_fwd
    from raytpu.ops.intersect import tri_constants
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

    scene, lights, cam = setup
    cfg = RenderConfig(width=32, height=32, mode="clean")
    xs, ys = pixel_grid(cfg)
    dirs = camera_ray_dirs(xs, ys, cam, cfg)
    consts = tri_constants(scene, cam.pos)
    consts_l = tri_constants(scene, lights.position[0])
    p_eff = lights.mask[0] * (lights.color[0] * lights.intensity[0])

    _, _, idx_m, occ_m = _call_fwd(
        dirs, consts.m, consts.k0, consts.valid, consts_l.m, consts_l.k0,
        scene.normals(), scene.color, cam.pos, lights.position[0],
        p_eff, cam.dof_focus, 1024, 512, 0.2, False,
    )
    t2, idx2, occ2 = closest_hit_occluded(
        jnp.concatenate([dirs, jnp.ones(((-dirs.shape[0]) % 1024, 3))]),
        consts.m, consts.k0, consts.valid, consts_l.m, consts_l.k0,
        cam.pos, lights.position[0], 1024, 512,
    )
    R = dirs.shape[0]
    assert (np.asarray(idx_m)[0, :R] == np.asarray(idx2)[:R]).all()
    hit = np.asarray(idx2)[:R] >= 0
    assert (
        (np.asarray(occ_m)[0, :R] > 0) == ((np.asarray(occ2)[:R] > 0) & hit)
    )[hit].all()


def test_grads_match_xla(setup):
    scene, lights, cam = setup
    cfg_m = RenderConfig(width=16, height=16, mode="clean", use_pallas=True,
                         megakernel=True)
    cfg_x = dataclasses.replace(cfg_m, use_pallas=False, megakernel=False)

    def loss(s, c, l, cfg):
        out = raytrace_full(s, c, l, cfg)
        return (jnp.mean(out.image ** 2)
                + 0.1 * jnp.mean(out.focal_distances ** 2))

    gm = jax.grad(loss, argnums=(0, 1, 2))(scene, cam, lights, cfg_m)
    gx = jax.grad(loss, argnums=(0, 1, 2))(scene, cam, lights, cfg_x)
    for pm, px in zip(
        jax.tree_util.tree_leaves(gm), jax.tree_util.tree_leaves(gx)
    ):
        np.testing.assert_allclose(
            np.asarray(pm), np.asarray(px), rtol=1e-4, atol=1e-5
        )


def test_falls_back_outside_scope(setup):
    """Multi-light / soft-shadow / AA configs must keep working (they
    route to the streaming multi-source kernels, not the megakernel)."""
    scene, _, cam = setup
    lights = Lights.single(capacity=2, soft_samples=4)
    cfg = RenderConfig(width=16, height=16, mode="clean",
                       soft_shadow_samples=4, use_pallas=True)
    img = raytrace_full(scene, cam, lights, cfg).image
    assert np.isfinite(np.asarray(img)).all()
