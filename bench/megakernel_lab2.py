"""Round-4 experiment 2: why is the 2-phase Cornell kernel 0.64 ms when
plane tests are 0.21 ms?

  a) primary-only closest_hit
  b) fused 2-phase closest_hit_occluded (reference point)
  c) no-op kernel with the identical grid/specs (per-step overhead + DMA)
  d) single-step fused kernel (primary+shadow in ONE grid step per tile)
  e) chunk-size sweep via pad_to (compute-bound vs overhead-bound)
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

_F32MAX = 3.4028235e38


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(fn, x, iters=20, batches=4, reps=3):
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

    t0 = time.time()
    jax.block_until_ready(chained(x))
    log(f"  compile: {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        for _ in range(reps):
            out = chained(x)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best / reps / iters * 1e3


def onestep_kernel(dirs_ref, blk_ref, blks_ref, org_ref, t_ref, idx_ref,
                   occ_ref, *, C: int):
    """Primary + shadow for a single chunk in ONE grid step per ray tile."""
    from raytpu.kernels.intersect_pallas import _chunk_tuv

    dirs = dirs_ref[:, :]
    t, ok = _chunk_tuv(blk_ref, C, dirs[0:1, :], dirs[1:2, :], dirs[2:3, :])
    tm = jnp.where(ok, t, _F32MAX)
    best_t = jnp.min(tm, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, dimension=0)
    best_idx = jnp.max(
        jnp.where(tm == best_t, rows, -1), axis=0, keepdims=True
    )
    t_ref[:, :] = best_t
    idx_ref[:, :] = jnp.where(best_t < _F32MAX, best_idx, -1)

    tz = jnp.where(best_t < _F32MAX, best_t, 0.0)
    d2 = []
    for i in range(3):
        cam_i = org_ref[i : i + 1, 0:1]
        light_i = org_ref[3 + i : 4 + i, 0:1]
        d2.append((cam_i + tz * dirs[i : i + 1, :]) - light_i)
    ts, oks = _chunk_tuv(blks_ref, C, d2[0], d2[1], d2[2])
    occ = oks & (ts < 0.99)
    occ_ref[:, :] = jnp.max(
        jnp.where(occ, 1, 0), axis=0, keepdims=True
    ).astype(jnp.int32)


def run_onestep(dirs_t, blk_p, blk_s, org, tile_r, C):
    R = dirs_t.shape[1]
    kernel = functools.partial(onestep_kernel, C=C)
    return pl.pallas_call(
        kernel,
        grid=(R // tile_r,),
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * C, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * C, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
    )(dirs_t, blk_p, blk_s, org)


def noop_kernel(dirs_ref, blk_ref, org_ref, t_ref, idx_ref, occ_ref):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == n_chunks - 1)
    def _():
        t_ref[:, :] = dirs_ref[0:1, :]
        idx_ref[:, :] = jnp.zeros_like(idx_ref[:, :])
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])


def run_noop(dirs_t, blocked, org, tile_r, chunk):
    R = dirs_t.shape[1]
    n2 = blocked.shape[0] // (4 * chunk)
    return pl.pallas_call(
        noop_kernel,
        grid=(R // tile_r, n2),
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * chunk, 3), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
    )(dirs_t, blocked, org)


def main():
    enable_cache()
    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.kernels.intersect_pallas import (
        _blocked_constants,
        _tight_chunk,
        closest_hit,
        closest_hit_occluded,
    )
    from raytpu.ops.intersect import tri_constants
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

    size = 512
    lights = Lights.single(capacity=1)
    cam = Camera.raytracer_default()
    cfg = RenderConfig(width=size, height=size, mode="clean")
    log(f"device: {jax.devices()[0]}")

    xs, ys = pixel_grid(cfg)
    dirs = jax.block_until_ready(camera_ray_dirs(xs, ys, cam, cfg))
    dirs_t = jnp.asarray(dirs.T)

    for pad in (32, 64, 128):
        scene = cornell_box(pad_to=pad)
        consts = tri_constants(scene, cam.pos)
        consts_l = tri_constants(scene, lights.position[0])

        def pri(d, consts=consts):
            return closest_hit(d, consts.m, consts.k0, consts.valid,
                               2048, 512)
        ms = chain_time(pri, dirs)
        log(f"T={pad}: primary-only closest_hit: {ms:.3f} ms")

        def fus(d, consts=consts, consts_l=consts_l):
            return closest_hit_occluded(
                d, consts.m, consts.k0, consts.valid,
                consts_l.m, consts_l.k0, cam.pos, lights.position[0],
                2048, 512,
            )
        ms = chain_time(fus, dirs)
        log(f"T={pad}: fused 2-phase: {ms:.3f} ms")

        chunk = _tight_chunk(pad, 512)
        blk_p, _ = _blocked_constants(consts.m, consts.k0, consts.valid,
                                      chunk)
        blk_s, _ = _blocked_constants(consts_l.m, consts_l.k0,
                                      consts.valid, chunk)
        blocked = jnp.concatenate([blk_p, blk_s], axis=0)
        org = jnp.zeros((8, 128), jnp.float32)
        org = org.at[0:3, 0].set(cam.pos)
        org = org.at[3:6, 0].set(lights.position[0])

        def nop(d, blocked=blocked, org=org, chunk=chunk):
            return run_noop(d, blocked, org, 2048, chunk)
        ms = chain_time(nop, dirs_t)
        log(f"T={pad}: no-op same grid: {ms:.3f} ms")

        def one(d, blk_p=blk_p, blk_s=blk_s, org=org, chunk=chunk):
            return run_onestep(d, blk_p, blk_s, org, 2048, chunk)
        ms = chain_time(one, dirs_t)
        log(f"T={pad}: single-step fused: {ms:.3f} ms")


if __name__ == "__main__":
    main()
