"""Gradient correctness: jax.grad vs finite differences.

BASELINE.json north star: gradient check < 1e-3 rel err. Methodology:
directional derivatives of a linear image functional L = sum(img * w) with
fixed random weights — linear in the image, so central differences are
exact up to f32 noise and the comparison isolates the renderer's Jacobian.

Interior gradients (light position/color/intensity, albedos, vertex
positions away from silhouettes) flow through the HARD clean renderers —
the argmin winner's t is smooth in the scene parameters. Silhouette
gradients require the soft paths; their checks are self-consistency
(fd of the soft loss itself) plus a sign test that occlusion boundaries
are visible to the loss.
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
import numpy as np
import pytest

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig, Scene
from raytpu.render.raytrace import raytrace_full
from raytpu.render.soft import rasterize_soft, raytrace_soft

SIZE = 32


def _setup():
    scene = cornell_box()
    # Deliberately non-axis-aligned camera: with a "clean" camera the
    # axis-aligned Cornell geometry projects edges EXACTLY onto pixel rows,
    # parking whole rows on clip/min kinks where fd averages the two
    # one-sided slopes and autodiff (correctly) picks one.
    cam = Camera.make((0.0137, 0.0071, -2.0213), yaw=0.003,
                      focal=float(SIZE) / 2.0 + 0.37)
    lights = Lights.single(capacity=1)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(SIZE, SIZE, 3)), jnp.float32)
    return scene, cam, lights, w


def _dir_deriv_check(img_fn, x, w, key, eps, n_dirs=2):
    """Compare <grad_x sum(img_fn(x)*w), d> with central differences.

    The fd numerator differences the IMAGES before the weighted sum
    (sum((img+ - img-) * w)), avoiding catastrophic cancellation of the
    scalar losses in f32.
    """

    def loss(xx):
        return jnp.sum(img_fn(xx) * w)

    g = jax.grad(loss)(x)
    g_flat, _ = ravel_pytree(g)
    x_flat, unravel = ravel_pytree(x)
    rng = np.random.default_rng(key)
    rel_errs = []
    for _ in range(n_dirs):
        d = rng.normal(size=x_flat.shape).astype(np.float32)
        d /= np.linalg.norm(d)
        d = jnp.asarray(d)
        img_p = img_fn(unravel(x_flat + eps * d))
        img_m = img_fn(unravel(x_flat - eps * d))
        fd = jnp.sum((img_p - img_m) * w) / (2 * eps)
        an = jnp.dot(g_flat, d)
        denom = max(abs(float(fd)), abs(float(an)), 1e-8)
        rel_errs.append(abs(float(fd) - float(an)) / denom)
    return max(rel_errs)


def test_raytrace_grads_light_params():
    """Grads wrt light position + color + intensity through the HARD clean
    raytracer (BASELINE config 3)."""
    scene, cam, lights, w = _setup()
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="clean")

    def img_fn(light_leaves):
        l2 = Lights(
            position=light_leaves["position"],
            color=light_leaves["color"],
            intensity=light_leaves["intensity"],
            mask=lights.mask,
            jitter=lights.jitter,
        )
        return raytrace_full(scene, cam, l2, cfg).image

    x = {
        "position": lights.position,
        "color": lights.color,
        "intensity": lights.intensity,
    }
    err = _dir_deriv_check(img_fn, x, w, key=1, eps=3e-3)
    assert err < 1e-3, f"rel err {err:.2e}"


def test_raytrace_grads_vertex_colors():
    """Grads wrt per-triangle albedo (linear path; must be near-exact)."""
    scene, cam, lights, w = _setup()
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="clean")

    def img_fn(color):
        s2 = Scene(v0=scene.v0, v1=scene.v1, v2=scene.v2, color=color,
                   active=scene.active)
        return raytrace_full(s2, cam, lights, cfg).image

    err = _dir_deriv_check(img_fn, scene.color, w, key=2, eps=1e-2)
    assert err < 1e-3, f"rel err {err:.2e}"


def _jvp_fields(img_fn, x, direction, eps):
    """Directional image derivative two ways: jax.jvp and central fd.
    Returns (jv, fd) as (R, 3) numpy arrays."""
    _, jv = jax.jvp(img_fn, (x,), (direction,))
    fd = (img_fn(x + eps * direction) - img_fn(x - eps * direction)) / (
        2 * eps
    )
    return np.asarray(jv).reshape(-1, 3), np.asarray(fd).reshape(-1, 3)


def _normwise_rel_err(jv, fd, mask=None):
    """||jv - fd|| / ||jv|| over masked pixels — averages out the per-pixel
    f32 fd noise (~ulp(img)/2eps) which dominates per-pixel comparisons."""
    if mask is not None:
        jv = jv[mask]
        fd = fd[mask]
    return float(
        np.linalg.norm(jv - fd) / max(np.linalg.norm(jv), 1e-12)
    )


def test_raytrace_grads_vertices_interior():
    """Interior grads wrt vertex positions through the hard renderer.

    A dense direction moves every silhouette, and the hard renderer's
    analytic gradient legitimately misses those boundary terms (that's what
    the soft path is for). So restrict the loss to a window strictly inside
    one surface's projection (center of the back wall): the winner is
    locally constant there, the map is smooth, and fd must match tightly."""
    scene, cam, lights, _ = _setup()
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="clean")
    # Build a weight mask over pixels whose winner equals that of all
    # 4-neighbours (strictly interior to one triangle's projection).
    from raytpu.ops.intersect import intersect, tri_constants
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

    xs, ys = pixel_grid(cfg)
    dirs = camera_ray_dirs(xs, ys, cam, cfg)
    idx = np.asarray(
        intersect(dirs, tri_constants(scene, cam.pos), 512).idx
    ).reshape(SIZE, SIZE)
    interior = np.ones_like(idx, bool)
    interior[1:-1, 1:-1] = (
        (idx[1:-1, 1:-1] == idx[:-2, 1:-1])
        & (idx[1:-1, 1:-1] == idx[2:, 1:-1])
        & (idx[1:-1, 1:-1] == idx[1:-1, :-2])
        & (idx[1:-1, 1:-1] == idx[1:-1, 2:])
    )
    interior[0, :] = interior[-1, :] = interior[:, 0] = interior[:, -1] = 0
    # Also exclude SHADOW boundaries (the hard occlusion test is a step
    # the analytic gradient cannot see): mask out pixels whose local
    # image neighbourhood varies sharply.
    base = np.asarray(
        raytrace_full(scene, cam, lights, cfg).image
    ).max(axis=-1)
    grad_mag = np.zeros_like(base)
    grad_mag[1:-1, 1:-1] = np.maximum(
        np.abs(base[2:, 1:-1] - base[:-2, 1:-1]),
        np.abs(base[1:-1, 2:] - base[1:-1, :-2]),
    )
    interior &= grad_mag < 0.05
    w = np.random.default_rng(3).normal(size=(SIZE, SIZE, 3)).astype(
        np.float32
    ) * interior[..., None]
    w = jnp.asarray(w)

    def img_fn(v0):
        s2 = Scene(v0=v0, v1=scene.v1, v2=scene.v2, color=scene.color,
                   active=scene.active)
        return raytrace_full(s2, cam, lights, cfg).image

    rng = np.random.default_rng(3)
    d = rng.normal(size=(30, 3)).astype(np.float32)
    d /= np.linalg.norm(d)
    jv, fd = _jvp_fields(img_fn, scene.v0, jnp.asarray(d), eps=2e-3)
    err = _normwise_rel_err(jv, fd, mask=np.asarray(interior).reshape(-1))
    assert err < 1e-3, f"rel err {err:.2e}"


def test_soft_rasterizer_grads_vertices():
    """Soft rasterizer: smooth everywhere — fd must match tightly,
    including silhouette motion (BASELINE config 4 requirement)."""
    scene, cam, lights, w = _setup()
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="soft",
                       soft_edge_sharpness=10.0, soft_z_sharpness=20.0)

    def img_fn(v0):
        s2 = Scene(v0=v0, v1=scene.v1, v2=scene.v2, color=scene.color,
                   active=scene.active)
        return rasterize_soft(s2, cam, lights, cfg)

    err = _dir_deriv_check(img_fn, scene.v0, w, key=4, eps=1e-3)
    assert err < 1e-2, f"rel err {err:.2e}"


def test_soft_raytracer_grads_vertices():
    scene, cam, lights, w = _setup()
    # Round 4: the raytracer's depth logit became METRIC (t * |d|), so
    # one unit of z-sharpness is ~|d| (~300x) sharper than before;
    # zs = 2.0 here is comparable to the old effective softness. At
    # zs = 10 the f32 central difference at any viable eps is
    # truncation-limited (~0.18 rel) while an f64 fd converges to the
    # SAME autodiff jvp at 2e-9 — the Jacobian is exact either way.
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="soft",
                       soft_edge_sharpness=20.0, soft_z_sharpness=2.0)

    def img_fn(v0):
        s2 = Scene(v0=v0, v1=scene.v1, v2=scene.v2, color=scene.color,
                   active=scene.active)
        return raytrace_soft(s2, cam, lights, cfg)

    rng = np.random.default_rng(5)
    d = rng.normal(size=(30, 3)).astype(np.float32)
    d /= np.linalg.norm(d)
    jv, fd = _jvp_fields(img_fn, scene.v0, jnp.asarray(d), eps=1e-3)
    # Smooth everywhere except measure-zero min/clip kinks.
    assert _normwise_rel_err(jv, fd) < 1e-2


def test_soft_rasterizer_hard_limit():
    """High sharpness must converge to the exact (float-precise) hard
    rasterizer — its true limit. (The 'parity' scanline path differs at
    boundaries/attributes by construction; see test_rasterize_parity.)"""
    from raytpu.render.soft import rasterize_exact

    scene = cornell_box()
    size = 64
    cam = Camera.make((0.011, -0.007, -3.013), focal=float(size) + 0.23,
                      y_scale=1.01, dof_focus=1.9)
    lights = Lights.single(capacity=1)
    cfg_hard = RenderConfig(width=size, height=size, mode="clean")
    hard = np.asarray(rasterize_exact(scene, cam, lights, cfg_hard))
    soft = np.asarray(
        rasterize_soft(
            scene, cam, lights,
            RenderConfig(width=size, height=size, mode="soft",
                         soft_edge_sharpness=4e4,
                         soft_z_sharpness=4e3),
        )
    )
    diff = np.abs(hard - soft).max(axis=-1)
    # Convergence needs edge_sharpness >> z_sharpness * max zinv gap, else
    # a closer triangle's depth advantage bleeds past its edge (SoftRas
    # coverage/depth coupling). At beta/gamma = 10 the bleed is ~0.025 px.
    assert (diff < 5e-3).mean() > 0.99, f"{(diff < 5e-3).mean():.4f}"


def test_soft_silhouette_gradient_sign():
    """Moving the tall block toward the camera (-z) must increase its
    footprint: the gradient of covered-area wrt the block's z must be
    negative through the soft rasterizer."""
    scene, cam, lights, _ = _setup()
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="soft",
                       soft_edge_sharpness=5.0, soft_z_sharpness=20.0)
    cam = Camera.make((0.0, 0.0, -3.0), focal=float(SIZE), y_scale=1.0)
    block = np.zeros((30,), np.float32)
    block[20:30] = 1.0  # tall block triangles
    block = jnp.asarray(block)

    def block_coverage(dz):
        shift = dz * block[:, None] * jnp.array([0.0, 0.0, 1.0])
        s2 = Scene(v0=scene.v0 + shift, v1=scene.v1 + shift,
                   v2=scene.v2 + shift, color=scene.color,
                   active=scene.active)
        img = rasterize_soft(s2, cam, lights, cfg)
        # blue-channel dominance marks the blue block
        return jnp.sum(jax.nn.relu(img[..., 2] - img[..., 0]))

    g = jax.grad(block_coverage)(jnp.float32(0.0))
    assert float(g) < 0.0


def test_soft_chunking_equivalence():
    """Streaming-softmax chunked soft renders must match the monolithic
    single-chunk computation (same math, different association order)."""
    scene, cam, lights, _ = _setup()
    base = dict(width=SIZE, height=SIZE, mode="soft",
                soft_edge_sharpness=20.0, soft_z_sharpness=20.0)
    for fn in (rasterize_soft, raytrace_soft):
        img1 = np.asarray(
            fn(scene, cam, lights, RenderConfig(**base, raster_tri_chunk=30))
        )
        img2 = np.asarray(
            fn(scene, cam, lights, RenderConfig(**base, raster_tri_chunk=8))
        )
        np.testing.assert_allclose(img1, img2, atol=2e-5, rtol=1e-4)


def test_soft_raytracer_hard_limit():
    """High sharpness must converge to the clean hard raytrace — the
    round-5 bounded-background logit's hard limit is exact for true
    hits (t|d| >= dmin floors only plane-extension pseudo-hits).

    Threshold 0.98 (vs the rasterizer's 0.99): same SoftRas
    coverage/depth coupling (a closer triangle's depth advantage bleeds
    zs * dzinv / es past its edge — worse HERE in barycentric units
    than the raster's pixel units for Cornell's large walls), plus
    shadow-boundary pixels the rasterizer does not have.
    """
    from raytpu.render.raytrace import raytrace_full

    scene = cornell_box()
    size = 64
    cam = Camera.make((0.011, -0.007, -2.013), focal=float(size) + 0.23,
                      dof_focus=1.3)
    lights = Lights.single(capacity=1)
    hard = np.asarray(raytrace_full(
        scene, cam, lights,
        RenderConfig(width=size, height=size, mode="clean")).image)
    soft = np.asarray(raytrace_soft(
        scene, cam, lights,
        RenderConfig(width=size, height=size, mode="soft",
                     soft_edge_sharpness=4e4, soft_z_sharpness=4e3)))
    diff = np.abs(hard - soft).max(axis=-1)
    assert (diff < 5e-3).mean() > 0.98, f"{(diff < 5e-3).mean():.4f}"
