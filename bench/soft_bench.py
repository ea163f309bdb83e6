"""TPU timings for the differentiable (soft) render paths at 512^2.

Round-2 work (VERDICT #1): the soft mode is the project's thesis and had
zero recorded TPU numbers. This script measures fwd and fwd+bwd step time
for raytrace_soft / rasterize_soft on the Cornell box, chained through a
lax.scan exactly like bench.py's hard-path methodology (no dispatch gaps,
no loop-invariant hoisting).

Usage: python bench/soft_bench.py [--size 512] [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_steps(step_fn, params, iters):
    """Chain `iters` dependent evaluations of step_fn into one executable."""
    import jax

    @jax.jit
    def chained(p):
        def body(carry, _):
            out = step_fn(carry)
            return out[0], out[1]
        return jax.lax.scan(body, params, None, length=iters)

    return chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--renderer", choices=["raytrace", "rasterize", "both"],
                    default="both")
    ap.add_argument("--sharpness", type=float, default=40.0)
    ap.add_argument("--scene", choices=["cornell", "stl"],
                    default="cornell",
                    help="stl = the reference enemy1.stl (9216 padded "
                         "tris) — the VERDICT round-2 item 6 row")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from raytpu.utils.cache import enable as enable_cache

    enable_cache()

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.utils.profiling import FrameTimer

    if args.scene == "stl":
        from raytpu.core.stl import load_reference_model

        scene = load_reference_model(pad_to=9216)
    else:
        scene = cornell_box(pad_to=32)
    lights = Lights.single(capacity=1)
    size = args.size

    renderers = []
    if args.renderer in ("raytrace", "both"):
        from raytpu.render.soft import raytrace_soft

        renderers.append(
            ("raytrace_soft", raytrace_soft, Camera.raytracer_default())
        )
    if args.renderer in ("rasterize", "both"):
        from raytpu.render.soft import rasterize_soft

        renderers.append(
            ("rasterize_soft", rasterize_soft, Camera.rasterizer_default())
        )

    rows = {}
    for name, render, camera in renderers:
        cfg = RenderConfig(
            width=size, height=size, mode="soft",
            soft_edge_sharpness=args.sharpness,
            soft_z_sharpness=args.sharpness,
        )
        # raytrace_soft traces primary + shadow rays; rasterize has no
        # shadow pass -> 1 "ray" (pixel) each.
        rays = (2 if name == "raytrace_soft" else 1) * size * size

        fwd = jax.jit(lambda s, l, _r=render, _c=camera, _cfg=cfg:
                      _r(s, _c, l, _cfg))
        target = jax.block_until_ready(fwd(scene, lights))

        def loss_fn(p, _f=fwd, _t=target):
            img = _f(*p)
            return jnp.mean((img - _t) ** 2)

        vag = jax.value_and_grad(loss_fn)
        opt = optax.sgd(1e-9)

        def step(carry, _vag=vag, _opt=opt):
            p, os_ = carry
            loss, g = _vag(p)
            upd, os2 = _opt.update(g, os_, p)
            return (optax.apply_updates(p, upd), os2), loss

        params = (scene, lights)
        chained = chain_steps(step, (params, opt.init(params)), args.iters)

        # fwd-only chain: re-feed the image into the scene colors so the
        # scan body depends on the carry (no hoisting).
        @jax.jit
        def fwd_chain(s, l, _f=fwd):
            def body(carry, _):
                img = _f(carry, l)
                mean = jnp.mean(img) * 1e-20
                s2 = jax.tree_util.tree_map(
                    lambda a: a + mean.astype(a.dtype), carry
                )
                return s2, jnp.mean(img)
            return jax.lax.scan(body, s, None, length=args.iters)

        state0 = ((params, opt.init(params)))
        t0 = time.time()
        jax.block_until_ready(chained(state0))
        log(f"[{name}] fwd+bwd chain compile: {time.time()-t0:.1f}s")
        # Pipelined timing (see bench.py): per-call blocking charges the
        # ~20 ms remote-dispatch RTT to every call.
        timer = FrameTimer(rays_per_frame=rays * args.iters * 3)
        with timer.frame():
            for _ in range(3):
                out = chained(state0)
            jax.block_until_ready(out)
        step_ms = timer.times_s[-1] / 3 / args.iters * 1e3
        log(f"[{name}] fwd+bwd: {step_ms:.2f} ms/step -> "
            f"{rays / (step_ms / 1e3) / 1e6:.1f} Mrays/s")

        t0 = time.time()
        jax.block_until_ready(fwd_chain(scene, lights))
        log(f"[{name}] fwd chain compile: {time.time()-t0:.1f}s")
        timer2 = FrameTimer(rays_per_frame=rays * args.iters * 3)
        with timer2.frame():
            for _ in range(3):
                out = fwd_chain(scene, lights)
            jax.block_until_ready(out)
        fwd_ms = timer2.times_s[-1] / 3 / args.iters * 1e3
        log(f"[{name}] fwd-only: {fwd_ms:.2f} ms/frame -> "
            f"{rays / (fwd_ms / 1e3) / 1e6:.1f} Mrays/s")
        rows[name] = {
            "scene": args.scene,
            "tris": int(scene.num_triangles),
            "size": size,
            "fwd_ms": round(fwd_ms, 3),
            "train_ms": round(step_ms, 3),
            "train_mrays": round(rays / (step_ms / 1e3) / 1e6, 1),
        }

    import json

    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
