"""Per-piece TPU timings for the soft kernels (round-3 VERDICT item 3).

Splits the soft fwd+bwd step cost into its kernel launches so
optimization effort lands where the milliseconds are:

  raster      rasterize_soft_pallas   fwd   /  fwd+bwd
  primary     _primary_agg            fwd   /  fwd+bwd
  shadow      _shadow_trans           fwd   /  fwd+bwd

Same chained-scan methodology as bench.py (no dispatch gaps, no
loop-invariant hoisting: the fwd chains feed the output back into the
inputs at 1e-20 weight; the bwd chains are real optimizer steps).

Usage: python bench/soft_lab.py [--size 512] [--iters 10] [--tile-p N]
       [--chunk N]
"""

from __future__ import annotations

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_train(fn, params, iters):
    import jax
    import jax.numpy as jnp
    import optax

    target = jax.block_until_ready(fn(*params))

    def loss_fn(p):
        return jnp.mean((fn(*p) - target) ** 2)

    vag = jax.value_and_grad(loss_fn)
    opt = optax.sgd(1e-9)

    @jax.jit
    def chained(p, os0):
        def body(carry, _):
            p_, os_ = carry
            loss, g = vag(p_)
            upd, os2 = opt.update(g, os_, p_)
            return (optax.apply_updates(p_, upd), os2), loss
        return jax.lax.scan(body, (p, os0), None, length=iters)

    os0 = opt.init(params)
    t0 = time.time()
    jax.block_until_ready(chained(params, os0))
    log(f"  compile {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(3):
            out = chained(params, os0)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best / 3 / iters * 1e3


def time_fwd(fn, params, iters):
    import jax
    import jax.numpy as jnp

    first, rest = params[0], params[1:]

    @jax.jit
    def fwd_chain(x):
        def body(carry, _):
            out = fn(carry, *rest)
            mean = jnp.mean(out) * 1e-20
            x2 = jax.tree_util.tree_map(
                lambda a: a + mean.astype(a.dtype), carry)
            return x2, jnp.mean(out)
        return jax.lax.scan(body, x, None, length=iters)

    t0 = time.time()
    jax.block_until_ready(fwd_chain(first))
    log(f"  compile {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(3):
            out = fwd_chain(first)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best / 3 / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tile-p", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--platform", choices=["default", "cpu"],
                    default="default")
    ap.add_argument("--only", default=None,
                    help="comma list of rows to run (raster, primary, "
                         "shadow)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from raytpu.utils.cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.kernels import soft_raytrace_pallas as srt
    from raytpu.kernels.soft_raster_pallas import (
        lights_table,
        rasterize_soft_pallas,
    )
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

    size, iters = args.size, args.iters
    tile_p, chunk = args.tile_p, args.chunk
    only = set(args.only.split(",")) if args.only else None
    cfg = RenderConfig(width=size, height=size, mode="soft",
                       soft_edge_sharpness=40.0, soft_z_sharpness=40.0)
    scene = cornell_box(pad_to=32)
    lights = Lights.single(capacity=1)
    cam_rt = Camera.raytracer_default()
    cam_rz = Camera.rasterizer_default()
    log(f"[soft_lab] device: {jax.devices()[0]} size={size} "
        f"tile_p={tile_p} chunk={chunk}")

    rows = {}

    def run(name, fn, params):
        if only is not None and name not in only:
            return
        log(f"[soft_lab] {name} fwd:")
        f = time_fwd(fn, params, iters)
        log(f"[soft_lab] {name} fwd: {f:.3f} ms")
        log(f"[soft_lab] {name} train:")
        t = time_train(fn, params, iters)
        log(f"[soft_lab] {name} train: {t:.3f} ms "
            f"(bwd ~{t - f:.3f} ms)")
        rows[name] = {"fwd_ms": round(f, 3), "train_ms": round(t, 3)}

    # --- whole soft rasterize -------------------------------------------
    run("raster",
        lambda s, l: rasterize_soft_pallas(s, cam_rz, l, cfg,
                                           tile_p=tile_p, chunk=chunk),
        (scene, lights))

    # --- raytrace primary only ------------------------------------------
    es = float(cfg.soft_edge_sharpness)
    zs = float(cfg.soft_z_sharpness)
    xs, ys = pixel_grid(cfg)
    dirs_t = camera_ray_dirs(xs, ys, cam_rt, cfg).T  # (3, R)
    lt = lights_table(lights)

    def primary(s, l):
        pri = srt.primary_tri_constants(s, cam_rt.pos)
        glob = jnp.concatenate(
            [cam_rt.pos, jnp.zeros((13,), jnp.float32)])[None, :]
        out = srt._primary_agg(
            pri, glob, lights_table(l), dirs_t, None, es, zs,
            float(cfg.ambient), l.capacity, 0.1, tile_p, chunk)
        return out[0:3].T

    run("primary", primary, (scene, lights))

    # --- raytrace shadow only (world fixed) ------------------------------
    pri = srt.primary_tri_constants(scene, cam_rt.pos)
    glob = jnp.concatenate(
        [cam_rt.pos, jnp.zeros((13,), jnp.float32)])[None, :]
    world0 = jax.lax.stop_gradient(srt._primary_agg(
        pri, glob, lt, dirs_t, None, es, zs, float(cfg.ambient),
        lights.capacity, 0.1, tile_p, chunk))[6:9]

    def shadow(s, l):
        shw = srt.shadow_tri_constants(s)
        srcs = jnp.concatenate(
            [l.position, jnp.zeros((l.capacity, 5), jnp.float32)], axis=1)
        return srt._shadow_trans(shw, srcs, world0, None, es, zs,
                                 tile_p, chunk).T

    run("shadow", shadow, (scene, lights))

    import json
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
