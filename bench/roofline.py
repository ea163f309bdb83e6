"""Measured roofline for the headline train step (VERDICT r2 item 2).

The driver bench reports `pct_roof_est` against an ASSUMED 2.5e12
VPU-instr/s rate. This script measures what is measurable on this
image's remote-TPU tunnel and documents what is not:

  Trap (bench/timing_sanity.py): value-identical dispatches replay from
  a tunnel cache, and even value-unique SERIAL-op microbenchmarks time
  ~constant regardless of chain length — synthetic "peak FLOPs" kernels
  are untrustworthy here. Per-op rates must come from DIFFERENCING REAL
  kernels, whose work scales with data size the tunnel cannot fake.

  1. marginal intersect rate — the fused closest-hit forward kernel
     timed at several triangle counts T (no culling); the slope
     d(time)/d(tests) gives the kernel's sustained per-test cost with
     pipeline/launch overheads differenced OUT. Converted to VPU
     instr/s via the kernel's counted ~30 instr/test inner loop.
  2. HBM stream bandwidth — chained DEPENDENT elementwise passes over a
     256 MB array (each iteration's values differ, so no replay).
  3. headline attribution — fwd and fwd+bwd step times (bench.py
     methodology) decomposed against (1): what fraction of the 512^2
     Cornell step is intersect work running at the kernel's own
     sustained rate vs everything else (shade, one-hot gathers,
     backward, adam).

Output: one JSON dict on stdout; the committed analysis lives in
bench/ROOFLINE.md.

Reproduce:  python bench/roofline.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from raytpu.utils.cache import enable as enable_cache

enable_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Per-(ray, triangle) VPU instruction count of the fused closest-hit
# forward kernel's inner loop, counted from kernels/intersect_pallas.py
# (broadcast-FMA plane test + running argmin; FMA = 1 instr):
#   b = start - v0 translate ............. 0  (precomputed per chunk)
#   t numerator/denominator FMA chains ... 18 (3 dots x 3 FMA x 2)
#   reciprocal + t = num * rinv .......... 2
#   u, v barycentric FMAs ................ 6
#   bounds compares + AND chain + select . 7
FWD_INSTR_PER_TEST = 33.0

# v5e VPU spec (public: 8x128 vector lanes x 4 FMA units @ ~940 MHz):
# 1024 * 4 * 0.94e9 = 3.85e12 lane-instr/s. A SPEC number, reported for
# comparison — the measured sustained rate below is the honest roof.
SPEC_VPU_INSTR_S = 3.85e12


def _chain_fwd_ms(dirs, consts_fn, tris, iters=8):
    """bench.py-style dependent chain of the fused intersect forward at
    a given triangle count; returns ms/frame."""
    from raytpu.ops.intersect import intersect

    consts = consts_fn(tris)

    @jax.jit
    def chain(d):
        def body(carry, _):
            hits = intersect(carry, consts, use_pallas=True)
            eps = (hits.t.ravel()[0] * 1e-30).astype(carry.dtype)
            return carry + eps, hits.t.ravel()[0]
        return jax.lax.scan(body, d, None, length=iters)

    out = jax.block_until_ready(chain(dirs))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(3):
            out = chain(dirs)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / 3)
    return best / iters * 1e3


def marginal_rate(size=512):
    """Sustained per-test rate of the real kernel by T-differencing."""
    from raytpu.core.stl import load_stl
    from raytpu.core.types import Camera, RenderConfig, Scene
    from raytpu.ops.intersect import tri_constants
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

    cfg = RenderConfig(width=size, height=size, mode="clean")
    camera = Camera.raytracer_default()
    xs, ys = pixel_grid(cfg)
    dirs = camera_ray_dirs(xs, ys, camera, cfg)

    scene = load_stl("/root/reference/rasteriser/Source/enemy1.stl",
                     pad_to=9216)

    def consts_fn(tris):
        s = Scene(v0=scene.v0[:tris], v1=scene.v1[:tris],
                  v2=scene.v2[:tris], color=scene.color[:tris],
                  active=scene.active[:tris])
        return tri_constants(s, camera.pos)

    rows = []
    for tris in (2304, 4608, 9216):
        ms = _chain_fwd_ms(dirs, consts_fn, tris)
        rows.append((tris, ms))
        log(f"[roofline] intersect fwd T={tris}: {ms:.3f} ms")

    # Slope between the two largest T (overheads differenced out).
    (t1, m1), (t2, m2) = rows[-2], rows[-1]
    tests_per_ms = (t2 - t1) * size * size / (m2 - m1)
    instr_s = tests_per_ms * 1e3 * FWD_INSTR_PER_TEST
    log(f"[roofline] marginal: {tests_per_ms*1e3/1e9:.1f} Gtests/s "
        f"-> {instr_s/1e12:.2f} T instr/s sustained "
        f"({100*instr_s/SPEC_VPU_INSTR_S:.0f}% of VPU spec)")
    return rows, tests_per_ms, instr_s


def hbm_stream():
    """Dependent elementwise passes over 256 MB (read+write each)."""
    n = 64 * 1024 * 1024
    x = jnp.ones((n // 1024, 1024), jnp.float32)

    @jax.jit
    def chain(x):
        def body(v, _):
            return v * 0.9999999 + 1e-9, v.ravel()[0]
        return jax.lax.scan(body, x, None, length=8)

    out = jax.block_until_ready(chain(x))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(3):
            out = chain(x)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / 3)
    per_pass = best / 8
    gbs = 2.0 * 4.0 * n / per_pass / 1e9
    log(f"[roofline] HBM stream: {gbs:.0f} GB/s "
        f"({per_pass*1e3:.2f} ms / 512 MB moved)")
    return gbs


def headline(size=512, tris=32):
    import optax

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.render.raytrace import raytrace_full

    scene = cornell_box(pad_to=tris)
    camera = Camera.raytracer_default()
    lights = Lights.single(capacity=1)
    cfg = RenderConfig(width=size, height=size, mode="clean")
    target = jax.block_until_ready(jax.jit(
        lambda: raytrace_full(scene, camera, lights, cfg).image)())

    ITERS = 20

    @jax.jit
    def fwd_chain(s):
        def body(carry, _):
            img = raytrace_full(carry, camera, lights, cfg).image
            mean = jnp.mean(img) * 1e-20
            s2 = jax.tree_util.tree_map(
                lambda a: a + mean.astype(a.dtype), carry)
            return s2, jnp.mean(img)
        return jax.lax.scan(body, s, None, length=ITERS)

    opt = optax.adam(1e-9)

    def loss_fn(p):
        s, l = p
        img = raytrace_full(s, camera, l, cfg).image
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def train_chain(params, opt_state):
        def body(carry, _):
            p, os_ = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, os2 = opt.update(grads, os_, p)
            return (optax.apply_updates(p, updates), os2), loss
        return jax.lax.scan(body, (params, opt_state), None, length=ITERS)

    def best_ms(fn, *args):
        out = jax.block_until_ready(fn(*args))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            for _ in range(3):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / 3)
        return best / ITERS * 1e3

    params = (scene, lights)
    fwd_ms = best_ms(fwd_chain, scene)
    train_ms = best_ms(train_chain, params, opt.init(params))
    log(f"[roofline] headline fwd {fwd_ms:.3f} ms, train {train_ms:.3f} ms")
    return fwd_ms, train_ms


def main():
    dev = jax.devices()[0]
    log(f"[roofline] device: {dev.device_kind}")
    rows, tests_per_ms, instr_s = marginal_rate()
    gbs = hbm_stream()
    fwd_ms, train_ms = headline()

    # Intersect work in the headline step at the kernel's own sustained
    # rate: primary + shadow sweeps, fwd + ~2x for backward recompute.
    tests = 2.0 * 512 * 512 * 32
    ideal_fwd_ms = tests / tests_per_ms
    ideal_train_ms = ideal_fwd_ms * 3.0
    out = {
        "device": dev.device_kind,
        "intersect_fwd_ms_by_T": {str(t): round(m, 3) for t, m in rows},
        "sustained_gtests_s": round(tests_per_ms * 1e3 / 1e9, 1),
        "sustained_vpu_instr_s": round(instr_s / 1e9) * 1e9,
        "pct_of_vpu_spec": round(100 * instr_s / SPEC_VPU_INSTR_S, 1),
        "hbm_stream_gb_s": round(gbs, 1),
        "headline_fwd_ms": round(fwd_ms, 3),
        "headline_train_ms": round(train_ms, 3),
        "intersect_share_fwd_pct": round(100 * ideal_fwd_ms / fwd_ms, 1),
        "intersect_share_train_pct": round(
            100 * ideal_train_ms / train_ms, 1),
        "instr_per_test": FWD_INSTR_PER_TEST,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
