"""raytpu headline benchmark (driver-run).

Metric (BASELINE.json): Mrays/s/chip forward+backward at 512x512 Cornell
box. One frame = 512^2 primary rays + 512^2 shadow rays (one light, hard
shadows); a fwd+bwd step is value_and_grad of an image MSE wrt scene +
light parameters, so every ray is traced in the forward AND differentiated
in the backward.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the fastest CPU re-implementation we have of the same math —
the vectorized numpy oracle (raytpu.oracle.raytracer_oracle), forward-only,
measured at 128x128 on this host and scaled linearly in ray count to
512x512. This is GENEROUS to the baseline: numpy is vectorized where the
reference C++ loops per pixel, and backward would at least double its cost.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu(size=512, iters=20, use_pallas=None):
    import jax
    import jax.numpy as jnp

    from raytpu.utils.cache import enable as enable_cache

    enable_cache()

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.render.raytrace import raytrace_full

    scene = cornell_box(pad_to=32)
    camera = Camera.raytracer_default()
    lights = Lights.single(capacity=1)
    cfg = RenderConfig(width=size, height=size, mode="clean",
                       use_pallas=use_pallas)

    import optax

    # One jitted forward reused for the target render AND the fwd-only
    # timing below — every distinct jit costs a full (remote) compile.
    fwd = jax.jit(
        lambda s, l: raytrace_full(s, camera, l, cfg).image
    )
    target = jax.block_until_ready(fwd(scene, lights))

    def loss_fn(scene_, lights_):
        img = raytrace_full(scene_, camera, lights_, cfg).image
        return jnp.mean((img - target) ** 2)

    vag = jax.value_and_grad(loss_fn, argnums=(0, 1))

    # Chain `iters` REAL optimizer steps inside one executable (lax.scan):
    # per-call measurement under-reports by ~25% host/dispatch overhead,
    # while a scan whose body ignores its carry gets hoisted as
    # loop-invariant and over-reports 4x. A chained optimizer (tiny lr so
    # parameters stay put numerically) is both honest and dispatch-free.
    opt = optax.sgd(1e-9)

    @jax.jit
    def train_chain(s, l, opt_state):
        def body(carry, _):
            s_, l_, os_ = carry
            loss, grads = vag(s_, l_)
            updates, os2 = opt.update(grads, os_, (s_, l_))
            s2, l2 = optax.apply_updates((s_, l_), updates)
            return (s2, l2, os2), loss
        carry, losses = jax.lax.scan(
            body, (s, l, opt_state), None, length=iters
        )
        return losses

    opt_state = opt.init((scene, lights))
    t0 = time.time()
    out = jax.block_until_ready(train_chain(scene, lights, opt_state))
    compile_s = time.time() - t0
    log(f"[bench] fwd+bwd chain compile: {compile_s:.1f}s on "
        f"{jax.devices()[0]}")

    t0 = time.time()
    for _ in range(3):
        out = train_chain(scene, lights, opt_state)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3 / iters

    rays_per_frame = 2 * size * size  # primary + shadow
    mrays = rays_per_frame / dt / 1e6
    log(f"[bench] fwd+bwd train step: {dt*1e3:.2f} ms -> "
        f"{mrays:.1f} Mrays/s")

    # Forward-only for reference (same executable as the target render).
    jax.block_until_ready(fwd(scene, lights))
    t0 = time.time()
    for _ in range(iters):
        img = fwd(scene, lights)
    jax.block_until_ready(img)
    fwd_dt = (time.time() - t0) / iters
    log(f"[bench] fwd-only: {fwd_dt*1e3:.2f} ms/frame -> "
        f"{rays_per_frame/fwd_dt/1e6:.1f} Mrays/s")
    return mrays, dt, fwd_dt


def bench_cpu_oracle(size=128):
    """Numpy-oracle forward at `size`, scaled to 512^2 ray count."""
    from raytpu.core.cornell import cornell_box_numpy
    from raytpu.oracle import raytracer_oracle as oracle

    arrays = cornell_box_numpy()
    t0 = time.time()
    oracle.render(arrays, width=size, height=size)
    dt = time.time() - t0
    rays = 2 * size * size
    mrays = rays / dt / 1e6
    log(f"[bench] numpy oracle fwd @ {size}^2: {dt*1e3:.0f} ms "
        f"-> {mrays:.2f} Mrays/s (fwd only)")
    return mrays


def _result_json(mrays, baseline_mrays, impl):
    return json.dumps({
        "metric": ("Mrays/s/chip fwd+bwd 512x512 Cornell "
                   f"(primary+shadow, {impl})"),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline_mrays, 2),
    })


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=["auto", "pallas", "xla"],
                    default="auto")
    ap.add_argument("--pallas-timeout", type=float, default=480.0,
                    help="seconds to allow the Pallas-path child before "
                         "falling back to the XLA path")
    args = ap.parse_args()

    if args.impl in ("pallas", "xla"):
        mrays, _, _ = bench_tpu(use_pallas=(args.impl == "pallas"))
        print(_result_json(mrays, bench_cpu_oracle(), args.impl),
              flush=True)
        return

    # auto: the fused Pallas kernels are ~3x faster but their first
    # (uncached) compile through this image's remote-compile tunnel has
    # minutes-level variance — run them in a time-boxed child and fall
    # back to the always-fast XLA path. Successful child runs populate
    # the persistent compilation cache, making later runs quick.
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--impl", "pallas"],
            capture_output=True, text=True, timeout=args.pallas_timeout,
        )
        if proc.returncode == 0:
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    log(proc.stderr[-2000:])
                    return
        log(f"[bench] pallas child failed rc={proc.returncode}; "
            f"stderr tail: {proc.stderr[-500:]}")
    except subprocess.TimeoutExpired:
        log("[bench] pallas child timed out; falling back to XLA path")

    mrays, _, _ = bench_tpu(use_pallas=False)
    print(_result_json(mrays, bench_cpu_oracle(), "xla"), flush=True)


if __name__ == "__main__":
    main()
