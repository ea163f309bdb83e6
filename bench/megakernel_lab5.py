"""Round-4 experiment 5: decompose the hard-raytrace FORWARD epilogue.

fwd slope is ~0.34 ms vs ~0.25 ms kernel-alone; this slope-times the
XLA epilogue stages (given precomputed kernel outputs) to find the
dominant piece:
  a) kernel alone
  b) + hit_distances (norm) + record wheres + fd
  c) + one-hot gather of normals+albedo
  d) + direct_light + composite (full epilogue)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

from raytpu.utils.cache import enable as enable_cache

_F32MAX = 3.4028235e38


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope_time(fn, x, n_lo=5, n_hi=40, batches=4, reps=2):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def chained(a0, eps, iters):
        def body(carry, _):
            out = fn(carry)
            mean = sum(
                jnp.sum(jnp.asarray(o, jnp.float32) * 1e-30)
                for o in jax.tree_util.tree_leaves(out)
            )
            return jax.tree_util.tree_map(
                lambda a: a + mean.astype(a.dtype), carry), None
        return jax.lax.scan(body, jax.tree_util.tree_map(
            lambda a: a + eps.astype(a.dtype), a0), None, length=iters)

    def time_at(n):
        jax.block_until_ready(chained(x, jnp.float32(0.0), iters=n))
        ts = []
        for b in range(batches):
            t0 = time.time()
            for r in range(reps):
                out = chained(x, jnp.float32(b * reps + r) * 1e-30,
                              iters=n)
            jax.block_until_ready(out)
            ts.append((time.time() - t0) / reps * 1e3)
        return ts

    lo, hi = time_at(n_lo), time_at(n_hi)
    return (min(hi) - min(lo)) / (n_hi - n_lo)


def main():
    enable_cache()
    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.kernels.intersect_pallas import closest_hit_occluded
    from raytpu.ops.intersect import (
        gather_rows, one_hot_idx, tri_constants,
    )
    from raytpu.ops.shade import composite, direct_light
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

    log(f"device: {jax.devices()[0]}")
    size = 512
    scene = cornell_box(pad_to=32)
    lights = Lights.single(capacity=1)
    cam = Camera.raytracer_default()
    cfg = RenderConfig(width=size, height=size, mode="clean")
    xs, ys = pixel_grid(cfg)
    dirs0 = jax.block_until_ready(camera_ray_dirs(xs, ys, cam, cfg))
    consts = tri_constants(scene, cam.pos)
    consts_l = tri_constants(scene, lights.position[0])

    def kern(dirs):
        return closest_hit_occluded(
            dirs, consts.m, consts.k0, consts.valid, consts_l.m,
            consts_l.k0, cam.pos, lights.position[0], 2048, 512)

    ms = slope_time(lambda d: kern(d), dirs0)
    log(f"a) kernel alone: {ms:.3f} ms")

    def stage_b(dirs):
        t, idx, occ = kern(dirs)
        hit = t < _F32MAX
        tz = jnp.where(hit, t, 0.0)
        dist = jnp.where(hit, tz * jnp.linalg.norm(dirs, axis=-1), _F32MAX)
        pos = cam.pos[None, :] + tz[:, None] * dirs
        fd = jnp.where(dist < _F32MAX, dist - cam.dof_focus, 0.0)
        return pos, fd, idx, occ
    ms = slope_time(stage_b, dirs0)
    log(f"b) + distances/pos/fd: {ms:.3f} ms")

    def stage_c(dirs):
        pos, fd, idx, occ = stage_b(dirs)
        oh = one_hot_idx(jnp.maximum(idx, 0), 32)
        both = gather_rows(
            oh, jnp.concatenate([scene.normals(), scene.color], axis=1))
        return pos, fd, both, occ
    ms = slope_time(stage_c, dirs0)
    log(f"c) + one-hot gather: {ms:.3f} ms")

    def stage_d(dirs):
        t, idx, occ = kern(dirs)
        hit = t < _F32MAX
        tz = jnp.where(hit, t, 0.0)
        dist = jnp.where(hit, tz * jnp.linalg.norm(dirs, axis=-1), _F32MAX)
        pos = cam.pos[None, :] + tz[:, None] * dirs
        fd = jnp.where(dist < _F32MAX, dist - cam.dof_focus, 0.0)
        oh = one_hot_idx(jnp.maximum(idx, 0), 32)
        both = gather_rows(
            oh, jnp.concatenate([scene.normals(), scene.color], axis=1))
        n_dir, albedo = both[:, :3], both[:, 3:]
        occ_b = occ > 0
        direct = direct_light(
            pos, jnp.maximum(idx, 0), scene, lights, cfg, n_dir=n_dir,
            occlusion_fn=lambda *_: occ_b)
        color = composite(direct, albedo, hit, cfg)
        return color, fd
    ms = slope_time(stage_d, dirs0)
    log(f"d) full epilogue: {ms:.3f} ms")


if __name__ == "__main__":
    main()
