"""Chunk-culling benchmark on the real 9,028-tri enemy1.stl (TPU).

Measures the fused closest-hit kernel at 512^2 rays:
  brute          — intersect_pallas, file triangle order
  culled         — intersect_pallas_culled, file order
  culled+morton  — intersect_pallas_culled, Morton-sorted triangles

and asserts the culled winners are bit-identical to brute force (same
order). Prints keep-rate (fraction of (tile, chunk) steps that run) and
Gtests/s counted against the BRUTE-FORCE test count — the speedup IS the
work the cull provably skipped.
"""

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
from raytpu.kernels.cull import chunk_mask_for
from raytpu.kernels.intersect_pallas import (
    _tight_chunk,
    intersect_pallas,
    intersect_pallas_culled,
)
from raytpu.ops.intersect import tri_constants
from raytpu.render.raytrace import camera_ray_dirs, pixel_grid


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
    cam = Camera.make((0.0, -0.5, -5.0), focal=float(size))
    cfg = RenderConfig(width=size, height=size)
    xs, ys = pixel_grid(cfg)
    dirs = camera_ray_dirs(xs, ys, cam, cfg)
    R = dirs.shape[0]

    from raytpu.kernels.intersect_pallas import _swizzle, _tile_shape

    results = {}
    for name, reorder in (("file", None), ("morton", "morton")):
        scene = load_reference_model(reorder=reorder)
        T = scene.num_triangles
        consts = tri_constants(scene, cam.pos)

        chunk = _tight_chunk(T, 512)
        th, tw = _tile_shape((size, size), 2048)
        mask = np.asarray(chunk_mask_for(
            cam.pos, _swizzle(dirs, size, size, th, tw),
            scene.v0, scene.v1, scene.v2, scene.active, 2048, chunk,
        ))
        log(f"[{name}] T={T} chunks={mask.shape[1]} tile={th}x{tw} "
            f"keep-rate={mask.mean():.3f}")

        brute = jax.jit(lambda d, c: intersect_pallas(d, c))
        culled = jax.jit(
            lambda d, c, s=scene: intersect_pallas_culled(
                d, c, cam.pos, s.v0, s.v1, s.v2,
                image_hw=(size, size),
            )
        )
        dt_b, h_b = bench(brute, dirs, consts)
        dt_c, h_c = bench(culled, dirs, consts)

        mism = int((np.asarray(h_b.idx) != np.asarray(h_c.idx)).sum())
        tdiff = int((np.asarray(h_b.t) != np.asarray(h_c.t)).sum())
        gt = R * T / 1e9
        log(f"[{name}] brute  {dt_b*1e3:7.2f} ms  {gt/dt_b:6.1f} Gtests/s")
        log(f"[{name}] culled {dt_c*1e3:7.2f} ms  {gt/dt_c:6.1f} Gtests/s "
            f"({dt_b/dt_c:.2f}x)  idx-mismatch={mism} t-diff={tdiff}")
        assert mism == 0 and tdiff == 0, "culled result differs!"
        results[name] = (dt_b, dt_c, mask.mean())

    hit_frac = float(np.asarray(h_c.hit).mean())
    log(f"hit fraction: {hit_frac:.3f}")

    # End-to-end render (primary + shadow phases, 1 light, hard shadows):
    # the culled fused-multi route vs the unmasked fused-multi kernel.
    from raytpu.core.types import Lights
    from raytpu.kernels.intersect_pallas import (
        intersect_occluded_multi_pallas,
    )
    from raytpu.render.raytrace import raytrace_full

    scene = load_reference_model(reorder="morton")
    lights = Lights.single(capacity=1)
    cfg = RenderConfig(width=size, height=size, mode="clean",
                       use_pallas=True)
    cam_r = Camera.make((0.0, -0.5, -5.0), focal=float(size))
    render = jax.jit(
        lambda s, l: raytrace_full(s, cam_r, l, cfg).image
    )
    dt_r, img = bench(render, scene, lights, iters=10)
    consts = tri_constants(scene, cam_r.pos)
    src = lights.position
    consts_src = jax.vmap(lambda o: tri_constants(scene, o))(src)
    unmasked = jax.jit(
        lambda d, c, cs: intersect_occluded_multi_pallas(
            d, c, cs, cam_r.pos, src
        )
    )
    dt_u, _ = bench(unmasked, dirs, consts, consts_src, iters=10)
    log(f"e2e render (culled route): {dt_r*1e3:.2f} ms/frame; "
        f"unmasked fused intersect alone: {dt_u*1e3:.2f} ms")
    print({k: {"brute_ms": round(v[0] * 1e3, 2),
               "culled_ms": round(v[1] * 1e3, 2),
               "keep_rate": round(float(v[2]), 3)}
           for k, v in results.items()})


if __name__ == "__main__":
    main()
