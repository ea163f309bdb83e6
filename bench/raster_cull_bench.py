"""Screen-space chunk culling benchmark for the raster winner kernel
(TPU, real 9,028-tri enemy1.stl at 512^2)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.utils.cache import enable as enable_cache

enable_cache()

from raytpu.core.stl import load_reference_model
from raytpu.core.types import Camera, RenderConfig
from raytpu.kernels.raster_pallas import (
    chunk_screen_mask,
    raster_tri_constants,
    resolve_winner_pallas,
)
from raytpu.render.soft import _screen_vertices


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def main():
    size = 512
    scene = load_reference_model(reorder="morton")
    cam = Camera.make((0.0, -0.5, -5.0), focal=float(size))
    cfg = RenderConfig(width=size, height=size)
    sx, sy, zinv, _ = _screen_vertices(scene, cam, cfg)
    consts = raster_tri_constants(sx, sy, zinv, scene.active)
    ys, xs = jnp.meshgrid(
        jnp.arange(size, dtype=jnp.float32),
        jnp.arange(size, dtype=jnp.float32), indexing="ij",
    )
    px, py = xs.reshape(-1), ys.reshape(-1)

    mask = np.asarray(chunk_screen_mask(
        sx, sy, zinv, consts[:, 12], px, py, 2048, 128
    ))
    log(f"T={scene.num_triangles} chunks={mask.shape[1]} "
        f"(row-tile) keep-rate={mask.mean():.3f}")

    brute = jax.jit(lambda a, b, c: resolve_winner_pallas(a, b, c))
    culled = jax.jit(
        lambda a, b, c: resolve_winner_pallas(
            a, b, c, screen_verts=(sx, sy, zinv), image_hw=(size, size)
        )
    )
    dt_b, w_b = bench(brute, px, py, consts)
    dt_c, w_c = bench(culled, px, py, consts)
    mism = int((np.asarray(w_b) != np.asarray(w_c)).sum())
    log(f"brute  {dt_b*1e3:7.2f} ms")
    log(f"culled {dt_c*1e3:7.2f} ms ({dt_b/dt_c:.2f}x) mismatch={mism}")
    assert mism == 0
    cov = float((np.asarray(w_c) >= 0).mean())
    print({"brute_ms": round(dt_b * 1e3, 2),
           "culled_ms": round(dt_c * 1e3, 2),
           "speedup": round(dt_b / dt_c, 2),
           "coverage": round(cov, 4)})


if __name__ == "__main__":
    main()
