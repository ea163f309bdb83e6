"""TPU check: Pallas kernel vs XLA path bit-exactness + chained timings."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from raytpu.utils.cache import enable as enable_cache

enable_cache()

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig, Scene
from raytpu.ops.intersect import intersect, tri_constants
from raytpu.render.raytrace import camera_ray_dirs, pixel_grid


def log(*a):
    print(*a, file=sys.stderr, flush=True)


size = 512
cfg = RenderConfig(width=size, height=size, mode="clean")
camera = Camera.raytracer_default()
xs, ys = pixel_grid(cfg)
dirs = jax.jit(lambda: camera_ray_dirs(xs, ys, camera, cfg))()

key = jax.random.PRNGKey(1)
Tbig = 9216
v0 = jax.random.uniform(key, (Tbig, 3), jnp.float32, -1, 1)
e1 = jax.random.uniform(jax.random.PRNGKey(2), (Tbig, 3), jnp.float32,
                        -0.1, 0.1)
e2 = jax.random.uniform(jax.random.PRNGKey(3), (Tbig, 3), jnp.float32,
                        -0.1, 0.1)
big = Scene.from_vertices(v0, v0 + e1, v0 + e2,
                          jnp.full((Tbig, 3), 0.5, jnp.float32))

for name, scene in (("cornell32", cornell_box(pad_to=32)),
                    ("stl9216", big)):
    consts = tri_constants(scene, camera.pos)
    jx = jax.jit(lambda d, c=consts: intersect(d, c, use_pallas=False))
    pk = jax.jit(lambda d, c=consts: intersect(d, c, use_pallas=True))
    hx = jax.block_until_ready(jx(dirs))
    hp = jax.block_until_ready(pk(dirs))
    mi = int(jnp.sum(hx.idx != hp.idx))
    mt = int(jnp.sum(jnp.where(hx.hit, hx.t, 0) != jnp.where(hp.hit, hp.t, 0)))
    reldiff = float(jnp.max(jnp.where(
        hx.hit, jnp.abs(hx.t - jnp.where(hp.hit, hp.t, 0))
        / jnp.maximum(jnp.abs(hx.t), 1e-20), 0.0)))
    log(f"[{name}] idx mismatches={mi}  t mismatches={mt}  "
        f"max rel t diff={reldiff:.3e}")

    # Chained timing (dispatch-free).
    def chain(fn):
        def run(d):
            def step(dd, _):
                h = fn(dd)
                return dd + h.t[0] * 1e-30, None
            out, _ = jax.lax.scan(step, d, None, length=20)
            return out
        return jax.jit(run)

    for label, fn in (("xla", jx), ("pallas", pk)):
        f = chain(fn)
        jax.block_until_ready(f(dirs))
        t0 = time.time()
        for _ in range(3):
            out = f(dirs)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 3 / 20
        log(f"[{name}] {label:6s} intersect: {dt*1e3:7.3f} ms  "
            f"({dirs.shape[0]/dt/1e6:.0f} Mrays/s fwd)")
