"""Sweep TILE_R for the tight-chunk closest-hit kernel (diagnostic)."""

import sys
import time

import jax
import jax.numpy as jnp

from raytpu.utils.cache import enable as enable_cache

enable_cache()

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, RenderConfig
from raytpu.kernels.intersect_pallas import intersect_pallas
from raytpu.ops.intersect import tri_constants
from raytpu.render.raytrace import camera_ray_dirs, pixel_grid


def log(*a):
    print(*a, file=sys.stderr, flush=True)


cfg = RenderConfig(width=512, height=512)
camera = Camera.raytracer_default()
xs, ys = pixel_grid(cfg)
dirs = jax.jit(lambda: camera_ray_dirs(xs, ys, camera, cfg))()
consts = tri_constants(cornell_box(pad_to=32), camera.pos)

for tile_r in (2048, 4096, 8192, 16384, 32768):
    def chain(d, tile_r=tile_r):
        def step(dd, _):
            h = intersect_pallas(dd, consts, tile_r=tile_r)
            return dd + h.t[0] * 1e-30, None
        out, _ = jax.lax.scan(step, d, None, length=20)
        return out
    f = jax.jit(chain)
    try:
        jax.block_until_ready(f(dirs))
    except Exception as e:
        log(f"tile_r={tile_r:6d}: FAIL {type(e).__name__}")
        continue
    t0 = time.time()
    for _ in range(3):
        out = f(dirs)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3 / 20
    log(f"tile_r={tile_r:6d}: {dt*1e3:7.3f} ms "
        f"({dirs.shape[0]/dt/1e6:.0f} Mrays/s fwd)")
