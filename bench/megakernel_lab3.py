"""Round-4 experiment 3: is there a fixed per-ITERATION floor in the
chained-scan methodology, or is the no-op kernel really 0.45 ms?

Time total wall for iters in {5, 20, 80} for: scalar-only body, tiny
pallas kernel body, full fused kernel body. Fit total = const + k*iters.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.utils.cache import enable as enable_cache


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def total_time(fn, x, iters, batches=4, reps=3):
    @jax.jit
    def chained(a0):
        def body(carry, _):
            out = fn(carry)
            mean = sum(
                jnp.sum(jnp.asarray(o, jnp.float32) * 1e-30)
                for o in jax.tree_util.tree_leaves(out)
            )
            return carry + mean, None
        return jax.lax.scan(body, a0, None, length=iters)

    jax.block_until_ready(chained(x))
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        for _ in range(reps):
            out = chained(x)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best / reps * 1e3  # ms per chained call


def tiny_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] * 2.0


def run_tiny(x):
    return pl.pallas_call(
        tiny_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def main():
    enable_cache()
    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.kernels.intersect_pallas import closest_hit_occluded
    from raytpu.ops.intersect import tri_constants
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

    log(f"device: {jax.devices()[0]}")
    size = 512
    scene = cornell_box(pad_to=32)
    lights = Lights.single(capacity=1)
    cam = Camera.raytracer_default()
    cfg = RenderConfig(width=size, height=size, mode="clean")
    xs, ys = pixel_grid(cfg)
    dirs = jax.block_until_ready(camera_ray_dirs(xs, ys, cam, cfg))
    consts = tri_constants(scene, cam.pos)
    consts_l = tri_constants(scene, lights.position[0])

    cases = {
        "scalar": (lambda c: c * 1.0000001, jnp.float32(1.0)),
        "tiny-pallas": (run_tiny, jnp.ones((8, 128), jnp.float32)),
        "fused-kernel": (
            lambda d: closest_hit_occluded(
                d, consts.m, consts.k0, consts.valid,
                consts_l.m, consts_l.k0, cam.pos, lights.position[0],
                2048, 512),
            dirs,
        ),
    }
    for name, (fn, x) in cases.items():
        ts = {}
        for iters in (5, 20, 80):
            ts[iters] = total_time(fn, x, iters)
        k = (ts[80] - ts[5]) / 75.0
        const = ts[5] - 5 * k
        log(f"{name}: totals {ts[5]:.2f}/{ts[20]:.2f}/{ts[80]:.2f} ms "
            f"(5/20/80 iters) -> slope {k*1e3:.0f} us/iter, "
            f"fixed {const:.2f} ms")


if __name__ == "__main__":
    main()
