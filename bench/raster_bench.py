"""Rasterizer timing on TPU: exact (Pallas winner resolve) forward and the
soft rasterizer fwd+bwd train step, Cornell 512^2 and the 9k-tri STL.

Run: python bench/raster_bench.py [size]
"""

import sys
import time

import jax
import jax.numpy as jnp

from raytpu.utils.cache import enable as enable_cache

enable_cache()

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.render.soft import rasterize_exact, rasterize_soft

size = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def timeit(tag, fn, *args, iters=10):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"[{tag}] compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    px = size * size
    print(f"[{tag}] {dt*1e3:.2f} ms -> {px/dt/1e6:.0f} Mpx/s", flush=True)
    return dt


scene = cornell_box(pad_to=32)
cam = Camera.rasterizer_default()
lights = Lights.single(capacity=1)

cfg = RenderConfig(width=size, height=size, mode="clean")
exact = jax.jit(lambda s, l: rasterize_exact(s, cam, l, cfg))
timeit("exact fwd (pallas resolve)", exact, scene, lights)

cfg_x = cfg.replace(use_pallas=False)
exact_x = jax.jit(lambda s, l: rasterize_exact(s, cam, l, cfg_x))
timeit("exact fwd (xla)", exact_x, scene, lights)

cfg_s = RenderConfig(width=size, height=size, mode="soft",
                     raster_tri_chunk=32)
soft = jax.jit(lambda s, l: rasterize_soft(s, cam, l, cfg_s))
target = jax.block_until_ready(soft(scene, lights))

timeit("soft fwd", soft, scene, lights)


def loss(s, l):
    img = rasterize_soft(s, cam, l, cfg_s)
    return jnp.mean((img - target) ** 2)


vag = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
timeit("soft fwd+bwd", vag, scene, lights)

# Chained optimizer steps (dispatch-free, hoist-proof) — same methodology
# as bench.py: per-call timing through the remote-dispatch tunnel
# over-reports small kernels by ~0.5-1 ms/launch.
import optax

opt = optax.sgd(1e-9)
iters = 20


@jax.jit
def chain(s, l, os0):
    def body(carry, _):
        s_, l_, os_ = carry
        lo, grads = jax.value_and_grad(loss, argnums=(0, 1))(s_, l_)
        upd, os2 = opt.update(grads, os_, (s_, l_))
        s2, l2 = optax.apply_updates((s_, l_), upd)
        return (s2, l2, os2), lo

    _, losses = jax.lax.scan(body, (s, l, os0), None, length=iters)
    return losses


os0 = opt.init((scene, lights))
t0 = time.time()
jax.block_until_ready(chain(scene, lights, os0))
print(f"[soft chained] compile: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(3):
    out = chain(scene, lights, os0)
jax.block_until_ready(out)
dt = (time.time() - t0) / 3 / iters
print(f"[soft chained train step] {dt*1e3:.2f} ms -> "
      f"{size*size/dt/1e6:.0f} Mpx/s fwd+bwd", flush=True)
