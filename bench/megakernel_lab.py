"""Round-4 experiments: where does the 0.75 ms headline forward go?

Times (chained-scan, best-of-batches like bench.py):
  a) full current train step / fwd (reference point)
  b) bare fused kernel (closest_hit_occluded) with PRECOMPUTED dirs,
     sweeping tile_r — isolates per-tile grid overhead
  c) dirs generation alone (HIGHEST matmul)
Run on TPU: python bench/megakernel_lab.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from raytpu.utils.cache import enable as enable_cache


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(fn, args, iters=20, batches=4, reps=3):
    """fn(*args) -> pytree; chained via a tiny carry feedback."""

    @jax.jit
    def chained(a0):
        def body(carry, _):
            out = fn(*carry[0:1], *args[1:])
            mean = sum(
                jnp.sum(jnp.asarray(x, jnp.float32) * 1e-30)
                for x in jax.tree_util.tree_leaves(out)
            )
            s2 = jax.tree_util.tree_map(
                lambda a: a + mean.astype(a.dtype), carry[0]
            )
            return (s2,), None
        return jax.lax.scan(body, (a0,), None, length=iters)

    t0 = time.time()
    jax.block_until_ready(chained(args[0]))
    log(f"  compile: {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        for _ in range(reps):
            out = chained(args[0])
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best / reps / iters * 1e3


def main():
    enable_cache()
    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.kernels.intersect_pallas import closest_hit_occluded
    from raytpu.ops.intersect import tri_constants
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

    size = 512
    scene = cornell_box(pad_to=32)
    lights = Lights.single(capacity=1)
    cam = Camera.raytracer_default()
    cfg = RenderConfig(width=size, height=size, mode="clean")
    log(f"device: {jax.devices()[0]}")

    xs, ys = pixel_grid(cfg)
    dirs = jax.block_until_ready(camera_ray_dirs(xs, ys, cam, cfg))
    consts = tri_constants(scene, cam.pos)
    consts_l = tri_constants(scene, lights.position[0])

    # c) dirs gen alone
    def gen(c):
        return camera_ray_dirs(xs, ys, c, cfg)
    ms = chain_time(gen, (cam,))
    log(f"dirs gen alone: {ms:.3f} ms")

    # b) bare fused kernel, tile_r sweep
    for tile_r in (2048, 4096, 8192, 16384, 32768):
        def bare(d, tr=tile_r):
            return closest_hit_occluded(
                d, consts.m, consts.k0, consts.valid,
                consts_l.m, consts_l.k0, cam.pos, lights.position[0],
                tr, 512,
            )
        try:
            ms = chain_time(bare, (dirs,))
            log(f"bare fused kernel tile_r={tile_r}: {ms:.3f} ms")
        except Exception as e:  # noqa: BLE001
            log(f"tile_r={tile_r} FAILED: {type(e).__name__}: {e}")

    # a) current full fwd
    from raytpu.render.raytrace import raytrace_full

    def full(s, l):
        return raytrace_full(s, cam, l, cfg).image
    ms = chain_time(full, (scene, lights))
    log(f"full current fwd: {ms:.3f} ms")


if __name__ == "__main__":
    main()
