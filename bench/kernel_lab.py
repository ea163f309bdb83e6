"""Kernel variant lab (diagnostic, TPU-only).

Benchmarks closest-hit kernel variants against the shipped one:
  chunk:  pad T to 128 (current) vs round_up(T, 8)
  dot:    MXU HIGHEST matmul (current) vs VPU broadcast-FMA
  div:    3 divides (current) vs 1 reciprocal + 3 muls
  tile_r: 2048 / 4096 / 8192

For each variant prints time and idx/t mismatch counts vs the shipped
kernel on (a) Cornell 32 tris, (b) 9216-tri padded STL-like random scene.
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

enable_cache()

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, RenderConfig
from raytpu.kernels.intersect_pallas import _closest_hit_raw
from raytpu.ops.intersect import tri_constants
from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

_F32MAX = 3.4028235e38


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel_v(dirs_ref, m_ref, t_ref, idx_ref, best_t_ref, best_idx_ref, *,
              tri_chunk: int, dot: str, div: str):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    C = tri_chunk
    dirs = dirs_ref[:, :]  # (3, TILE_R)

    @pl.when(c == 0)
    def _():
        best_t_ref[:, :] = jnp.full_like(best_t_ref[:, :], _F32MAX)
        best_idx_ref[:, :] = jnp.zeros_like(best_idx_ref[:, :])

    n_rows = m_ref[0:C, :]
    c2_rows = m_ref[C : 2 * C, :]
    c3_rows = m_ref[2 * C : 3 * C, :]
    k0 = m_ref[3 * C : 4 * C, 0:1]  # (C, 1)

    if dot == "mxu":
        dn = jnp.dot(n_rows, dirs, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        du = jnp.dot(c2_rows, dirs, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        dv = jnp.dot(c3_rows, dirs, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    else:  # vpu broadcast-FMA
        dx = dirs[0:1, :]
        dy = dirs[1:2, :]
        dz = dirs[2:3, :]

        def dot3(rows):
            return (rows[:, 0:1] * dx + rows[:, 1:2] * dy
                    + rows[:, 2:3] * dz)

        dn = dot3(n_rows)
        du = dot3(c2_rows)
        dv = dot3(c3_rows)

    denom = -dn
    nonpar = denom != 0.0
    denom_safe = jnp.where(nonpar, denom, 1.0)
    if div == "div":
        t = k0 / denom_safe
        u = du / denom_safe
        v = dv / denom_safe
    else:
        r = 1.0 / denom_safe
        t = k0 * r
        u = du * r
        v = dv * r
    ok = (u + v <= 1.0) & (u >= 0.0) & (v >= 0.0) & (t >= 0.0) & nonpar
    tm = jnp.where(ok, t, _F32MAX)

    chunk_min = jnp.min(tm, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, dimension=0)
    chunk_idx = jnp.max(
        jnp.where(tm == chunk_min, rows, -1), axis=0, keepdims=True
    ) + c * C

    best_t = best_t_ref[:, :]
    upd = chunk_min <= best_t
    best_t = jnp.where(upd, chunk_min, best_t)
    best_idx = jnp.where(upd, chunk_idx, best_idx_ref[:, :])
    best_t_ref[:, :] = best_t
    best_idx_ref[:, :] = best_idx

    @pl.when(c == n_chunks - 1)
    def _():
        t_ref[:, :] = best_t
        idx_ref[:, :] = jnp.where(best_t < _F32MAX, best_idx, -1)


def run_variant(dirs_t, m, k0, valid, *, tile_r, chunk_mode, dot, div):
    R = dirs_t.shape[1]
    T0 = m.shape[0]
    if chunk_mode == "tight":
        chunk = min(128, max(8, -(-T0 // 8) * 8))
    else:
        chunk = 128
    T = ((T0 + chunk - 1) // chunk) * chunk
    padn = T - T0
    if padn:
        m = jnp.concatenate([m, jnp.zeros((padn, 3, 3), jnp.float32)], 0)
        k0 = jnp.concatenate([k0, jnp.zeros((padn,), jnp.float32)])
        valid = jnp.concatenate([valid, jnp.zeros((padn,), jnp.float32)])
    n_chunks = T // chunk

    m_masked = m * valid[:, None, None]
    k0_masked = k0 * valid
    mc = m_masked.reshape(n_chunks, chunk, 3, 3)
    k0c = k0_masked.reshape(n_chunks, chunk)
    k0_rows = jnp.stack([k0c, jnp.zeros_like(k0c), jnp.zeros_like(k0c)], -1)
    blocked = jnp.concatenate(
        [mc[:, :, 0, :], mc[:, :, 1, :], mc[:, :, 2, :], k0_rows], axis=1
    ).reshape(n_chunks * 4 * chunk, 3)

    grid = (R // tile_r, n_chunks)
    kernel = functools.partial(_kernel_v, tri_chunk=chunk, dot=dot, div=div)
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * chunk, 3), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_r), jnp.float32),
            pltpu.VMEM((1, tile_r), jnp.int32),
        ],
    )(dirs_t, blocked)
    return t[0], idx[0]


def bench(name, fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    return dt, out


def main():
    size = 512
    cfg = RenderConfig(width=size, height=size, mode="clean")
    camera = Camera.raytracer_default()
    xs, ys = pixel_grid(cfg)
    dirs = camera_ray_dirs(xs, ys, camera, cfg)
    dirs_t = jnp.asarray(dirs.T)

    scenes = {}
    scene = cornell_box(pad_to=32)
    c = tri_constants(scene, camera.pos)
    scenes["cornell32"] = (c.m, c.k0, c.valid)

    key = jax.random.PRNGKey(1)
    Tbig = 9216
    v0 = jax.random.uniform(key, (Tbig, 3), jnp.float32, -1, 1)
    e1 = jax.random.uniform(jax.random.PRNGKey(2), (Tbig, 3), jnp.float32,
                            -0.1, 0.1)
    e2 = jax.random.uniform(jax.random.PRNGKey(3), (Tbig, 3), jnp.float32,
                            -0.1, 0.1)
    from raytpu.core.types import Scene
    big = Scene.from_vertices(v0, v0 + e1, v0 + e2,
                              jnp.full((Tbig, 3), 0.5, jnp.float32))
    cb = tri_constants(big, camera.pos)
    scenes["stl9216"] = (cb.m, cb.k0, cb.valid)

    for sname, (m, k0, valid) in scenes.items():
        base_fn = jax.jit(lambda d: _closest_hit_raw(
            d, m, k0, valid, tile_r=2048, tri_chunk=512))
        dt0, (t0_, idx0) = bench(f"{sname} shipped", base_fn, dirs_t)
        log(f"[{sname}] shipped: {dt0*1e3:.3f} ms")
        for tile_r in (2048, 4096, 8192):
            for chunk_mode in ("pad128", "tight"):
                for dot in ("mxu", "vpu"):
                    for div in ("div", "recip"):
                        if chunk_mode == "pad128" and sname == "stl9216":
                            if (dot, div, tile_r) == ("mxu", "div", 2048):
                                pass  # baseline dup, still measure once
                        fn = jax.jit(functools.partial(
                            run_variant, tile_r=tile_r, chunk_mode=chunk_mode,
                            dot=dot, div=div))
                        try:
                            dt, (t_, idx_) = bench(
                                f"{sname}", fn, dirs_t, m, k0, valid)
                        except Exception as e:  # noqa
                            log(f"[{sname}] tile={tile_r} {chunk_mode} "
                                f"{dot} {div}: FAIL {type(e).__name__}")
                            continue
                        mism_i = int(jnp.sum(idx_ != idx0))
                        mism_t = int(jnp.sum(t_ != t0_))
                        log(f"[{sname}] tile={tile_r} {chunk_mode:6s} "
                            f"{dot} {div:5s}: {dt*1e3:7.3f} ms  "
                            f"idx!={mism_i} t!={mism_t}")


if __name__ == "__main__":
    main()
