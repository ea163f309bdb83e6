"""Stage-by-stage TPU timing of the headline train step (diagnostic).

Times each piece of the 512x512 clean-mode raytrace train step separately
to locate the bottleneck: primary intersect (Pallas), shadow intersect,
shading, full forward, and fwd+bwd. Each piece is jitted on its own with
chained-scan iterations so dispatch overhead doesn't pollute ms-level
numbers.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from raytpu.utils.cache import enable as enable_cache

enable_cache()

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.ops.intersect import (
    gather_rows, hit_distances, hit_positions, intersect, one_hot_idx,
    tri_constants,
)
from raytpu.ops.shade import composite, direct_light
from raytpu.render.raytrace import camera_ray_dirs, pixel_grid, raytrace_full


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SIZE = 512
ITERS = 20

scene = cornell_box(pad_to=32)
camera = Camera.raytracer_default()
lights = Lights.single(capacity=1)
cfg = RenderConfig(width=SIZE, height=SIZE, mode="clean")


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3 / ITERS
    log(f"{name:34s} {dt*1e3:7.3f} ms")
    return dt


def chain(body):
    """Chain ITERS dependent evaluations of body(x) -> pytree."""
    def run(x0):
        def step(x, _):
            out = body(x)
            # Perturb the carried input by a data-dependent epsilon so the
            # loop isn't hoisted as invariant.
            eps = jax.tree_util.tree_leaves(out)[0].ravel()[0] * 1e-30
            return x + eps, None
        x, _ = jax.lax.scan(step, x0, None, length=ITERS)
        return x
    return jax.jit(run)


xs, ys = pixel_grid(cfg)
consts = tri_constants(scene, camera.pos)
dirs0 = camera_ray_dirs(xs, ys, camera, cfg)

# 1. primary intersect only (pallas)
f = chain(lambda d: intersect(d, consts, use_pallas=True).t)
timeit("intersect (pallas) fwd", f, dirs0)

f = chain(lambda d: intersect(d, consts, use_pallas=False).t)
timeit("intersect (xla) fwd", f, dirs0)

# 2. intersect + hit bookkeeping
def hb(d):
    hits = intersect(d, consts, use_pallas=True)
    dist = hit_distances(d, hits)
    pos = hit_positions(camera.pos, d, hits)
    return dist + pos.sum(-1)
timeit("intersect+bookkeep fwd", chain(hb), dirs0)

# 3. shading (incl. shadow intersect) given fixed hits
hits0 = jax.jit(lambda d: intersect(d, consts, use_pallas=True))(dirs0)
pos0 = jax.block_until_ready(
    jax.jit(lambda d: hit_positions(camera.pos, d, hits0))(dirs0))
idx0 = jnp.maximum(hits0.idx, 0)

def shade_only(p):
    T = scene.num_triangles
    oh = one_hot_idx(idx0, T)
    n_dir = gather_rows(oh, scene.normals())
    albedo = gather_rows(oh, scene.color)
    direct = direct_light(p, idx0, scene, lights, cfg, n_dir=n_dir)
    return composite(direct, albedo, hits0.hit, cfg)
timeit("shade(+shadow intersect) fwd", chain(shade_only), pos0)

# 4. full forward (chained over a scalar perturbing the camera)
def full_body(eps):
    cam = Camera(pos=camera.pos + eps * 0, yaw=camera.yaw, focal=camera.focal,
                 y_scale=camera.y_scale, dof_focus=camera.dof_focus)
    return raytrace_full(scene, cam, lights, cfg).image
timeit("full forward", chain(full_body), jnp.float32(0.0))

# 5. fwd+bwd
target = jax.block_until_ready(
    jax.jit(lambda: raytrace_full(scene, camera, lights, cfg).image)())

def loss_of(eps):
    import dataclasses
    s = dataclasses.replace(scene, v0=scene.v0 + eps)
    img = raytrace_full(s, camera, lights, cfg).image
    return jnp.mean((img - target) ** 2)

timeit("fwd+bwd (grad wrt v0 eps)", chain(jax.grad(loss_of)),
       jnp.zeros((32, 3), jnp.float32))
