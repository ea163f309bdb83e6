"""Round-4 experiment 4: where do the megakernel's extra ~0.16 ms go?

Slope-timed (iters 5/40) variants:
  two-phase   closest_hit_occluded (reference kernel)
  mega-full   render_fused forward
  mega-nogather  gather replaced by constant attrs
  mega-noshade   gather kept, shading replaced by passthrough
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
from raytpu.kernels.intersect_pallas import _chunk_tuv
from raytpu.kernels import render_fused as rf

_F32MAX = 3.4028235e38


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope_time(fn, x, n_lo=5, n_hi=40, batches=4, reps=2):
    import functools as ft

    @ft.partial(jax.jit, static_argnames=("iters",))
    def chained(a0, eps, iters):
        def body(carry, _):
            out = fn(carry)
            mean = sum(
                jnp.sum(jnp.asarray(o, jnp.float32) * 1e-30)
                for o in jax.tree_util.tree_leaves(out)
            )
            return carry + mean, None
        return jax.lax.scan(body, a0 + eps, None, length=iters)

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


def variant_kernel(dirs_ref, blkp_ref, blks_ref, attrs_ref, par_ref,
                   color_ref, fd_ref, idx_ref, occ_ref, *,
                   C: int, gather: bool, shade: bool):
    dx = dirs_ref[0:1, :]
    dy = dirs_ref[1:2, :]
    dz = dirs_ref[2:3, :]
    t, ok = _chunk_tuv(blkp_ref, C, dx, dy, dz)
    tm = jnp.where(ok, t, _F32MAX)
    best_t = jnp.min(tm, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, dimension=0)
    best_idx = jnp.max(
        jnp.where(tm == best_t, rows, -1), axis=0, keepdims=True
    )
    hit = best_t < _F32MAX
    idx_ref[:, :] = jnp.where(hit, best_idx, -1)
    tz = jnp.where(hit, best_t, 0.0)

    def par_get(r, c):
        return par_ref[r : r + 1, c : c + 1]

    d2 = [
        (par_get(j, 0) + tz * dd) - par_get(3 + j, 0)
        for j, dd in ((0, dx), (1, dy), (2, dz))
    ]
    ts, oks = _chunk_tuv(blks_ref, C, d2[0], d2[1], d2[2])
    occ_any = jnp.max(
        jnp.where(oks & (ts < 0.99), 1, 0), axis=0, keepdims=True
    )
    occ_ref[:, :] = occ_any
    occ_b = occ_any > 0

    if gather:
        win = (rows == best_idx) & hit
        n_rows = [
            jnp.sum(jnp.where(win, attrs_ref[0:C, j : j + 1], 0.0),
                    axis=0, keepdims=True)
            for j in range(3)
        ]
        alb_rows = [
            jnp.sum(jnp.where(win, attrs_ref[C : 2 * C, j : j + 1], 0.0),
                    axis=0, keepdims=True)
            for j in range(3)
        ]
    else:
        n_rows = [tz * 0.1, tz * 0.2, tz * 0.3]
        alb_rows = [tz * 0.4, tz * 0.5, tz * 0.6]

    if shade:
        out = rf._shade_rows(dx, dy, dz, tz, hit, occ_b, n_rows, alb_rows,
                             par_get, ambient=0.2, parity=False)
        for j in range(3):
            color_ref[j : j + 1, :] = out[j]
        fd_ref[:, :] = out[3]
    else:
        for j in range(3):
            color_ref[j : j + 1, :] = n_rows[j] + alb_rows[j]
        fd_ref[:, :] = tz


def run_variant(dirs_t, blk_p, blk_s, attrs, par, tile_r, C, gather,
                shade):
    Rp = dirs_t.shape[1]
    kernel = functools.partial(variant_kernel, C=C, gather=gather,
                               shade=shade)
    return pl.pallas_call(
        kernel,
        grid=(Rp // tile_r,),
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * C, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * C, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * C, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
        ],
    )(dirs_t, blk_p, blk_s, attrs, par)


def main():
    enable_cache()
    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.kernels.intersect_pallas import (
        _blocked_constants,
        _tight_chunk,
        closest_hit_occluded,
    )
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
    dirs_t = jnp.asarray(dirs.T)
    consts = tri_constants(scene, cam.pos)
    consts_l = tri_constants(scene, lights.position[0])
    C = _tight_chunk(32, 512)
    blk_p, _ = _blocked_constants(consts.m, consts.k0, consts.valid, C)
    blk_s, _ = _blocked_constants(consts_l.m, consts_l.k0, consts.valid, C)
    attrs = jnp.concatenate(
        [rf._pad_tri(scene.normals(), C), rf._pad_tri(scene.color, C)],
        axis=0)
    p_eff = lights.mask[0] * (lights.color[0] * lights.intensity[0])
    par = rf._params_block(cam.pos, lights.position[0], p_eff,
                           cam.dof_focus)

    ms = slope_time(
        lambda d: closest_hit_occluded(
            d.T, consts.m, consts.k0, consts.valid, consts_l.m,
            consts_l.k0, cam.pos, lights.position[0], 2048, 512),
        dirs_t)
    log(f"two-phase: {ms:.3f} ms")

    for (g, s, name) in [(True, True, "mega-full"),
                         (False, True, "mega-nogather"),
                         (True, False, "mega-noshade"),
                         (False, False, "mega-neither")]:
        ms = slope_time(
            lambda d, g=g, s=s: run_variant(d, blk_p, blk_s, attrs, par,
                                            2048, C, g, s),
            dirs_t)
        log(f"{name}: {ms:.3f} ms")


if __name__ == "__main__":
    main()
