"""Benchmark-harness validation for this image's remote TPU tunnel.

Two measurement traps were found on the `axon` platform (round 3):

  1. Value-identical dispatches can be served from a replay cache —
     repeating `f(same_args)` for timing can measure the tunnel RTT,
     not the kernel. (Verified: a Pallas kernel with 64 vs 1024 serial
     transcendentals "ran" in the same 0.03 ms when fed a constant.)
  2. A second concurrent TPU client blocks until the first exits, so a
     contended benchmark measures queueing.

This script validates trap 1 does NOT bite the bench.py methodology: it
times the REAL headline train chain twice — batch A with bench.py's
identical-input pattern, batch B with value-unique inputs — and asserts
they agree within tolerance. If they ever diverge, bench.py's batches
must switch to unique inputs.

(Synthetic serial-op microbenchmarks remain untrustworthy here — a
dependency chain of transcendentals times ~constant regardless of length
even with unique inputs, so per-op VPU rates must be derived by
differencing REAL kernels; see bench/ROOFLINE.md.)

Usage: python bench/timing_sanity.py [--size 512] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", choices=["default", "cpu"],
                    default="default")
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from raytpu.utils.cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import optax

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.render.raytrace import raytrace_full

    size, iters = args.size, args.iters
    scene = cornell_box(pad_to=32)
    lights = Lights.single(capacity=1)
    cam = Camera.raytracer_default()
    cfg = RenderConfig(width=size, height=size, mode="clean")
    rt = lambda s, l: raytrace_full(s, cam, l, cfg).image  # noqa: E731
    params = (scene, lights)
    target = jax.block_until_ready(rt(*params))

    def loss_fn(p):
        return jnp.mean((rt(*p) - target) ** 2)

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
    log(f"[sanity] compile+first: {time.time()-t0:.1f}s")

    # A: identical inputs, pipelined (bench.py's pattern).
    t0 = time.time()
    outs = [chained(params, os0) for _ in range(3)]
    jax.block_until_ready(outs)
    a = (time.time() - t0) / 3 / iters * 1e3

    # B: value-unique inputs, pipelined.
    variants = jax.block_until_ready([
        jtu.tree_map(lambda x: x * (1.0 + 1e-6 * k), params)
        for k in range(1, 4)
    ])
    t0 = time.time()
    outs = [chained(v, os0) for v in variants]
    jax.block_until_ready(outs)
    b = (time.time() - t0) / 3 / iters * 1e3

    ratio = a / b
    ok = 0.8 <= ratio <= 1.25
    log(f"[sanity] identical {a:.3f} ms/step, unique {b:.3f} ms/step, "
        f"ratio {ratio:.3f} -> {'OK' if ok else 'DEDUPE SUSPECTED'}")
    print(json.dumps({
        "identical_ms": round(a, 3), "unique_ms": round(b, 3),
        "ratio": round(ratio, 3), "methodology_ok": ok,
    }), flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
