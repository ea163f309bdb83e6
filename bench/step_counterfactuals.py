"""Marginal cost of each train-step piece via counterfactual stubs."""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import optax

from raytpu.utils.cache import enable as enable_cache

enable_cache()

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.render.raytrace import raytrace_full


def log(*a):
    print(*a, file=sys.stderr, flush=True)


size = 512
scene = cornell_box(pad_to=32)
camera = Camera.raytracer_default()
lights = Lights.single(capacity=1)
cfg = RenderConfig(width=size, height=size, mode="clean")

import raytpu.ops.shade as shade_mod

target = jax.block_until_ready(
    jax.jit(lambda: raytrace_full(scene, camera, lights, cfg).image)())


def make_step(occlusion_override=None, skip_grad=False):
    def loss_fn(s, l):
        if occlusion_override is not None:
            import raytpu.ops.shade as sm
            orig = None
        img = raytrace_full(s, camera, l, cfg).image
        return jnp.mean((img - target) ** 2)
    return loss_fn


def timed_chain(name, loss_fn, grad=True):
    opt = optax.sgd(1e-9)
    vag = jax.value_and_grad(loss_fn, argnums=(0, 1)) if grad else None

    @jax.jit
    def chain(s, l, opt_state):
        def body(carry, _):
            s_, l_, os_ = carry
            if grad:
                loss, grads = vag(s_, l_)
                updates, os2 = opt.update(grads, os_, (s_, l_))
                s2, l2 = optax.apply_updates((s_, l_), updates)
                return (s2, l2, os2), loss
            loss = loss_fn(s_, l_)
            eps = loss * 1e-30
            s2 = dataclasses.replace(s_, v0=s_.v0 + eps)
            return (s2, l_, os_), loss
        carry, losses = jax.lax.scan(body, (s, l, opt_state), None, length=20)
        return losses

    opt_state = opt.init((scene, lights))
    out = jax.block_until_ready(chain(scene, lights, opt_state))
    t0 = time.time()
    for _ in range(3):
        out = chain(scene, lights, opt_state)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3 / 20
    log(f"{name:44s} {dt*1e3:7.3f} ms")
    return dt


# Full step (reference point).
def loss_full(s, l):
    img = raytrace_full(s, camera, l, cfg).image
    return jnp.mean((img - target) ** 2)

timed_chain("full fwd+bwd", loss_full)
timed_chain("full fwd only", loss_full, grad=False)

# No shadow pass: monkeypatch occlusion to constant False by calling
# direct_light with occlusion_fn.
from raytpu.core.types import Scene
from raytpu.ops.intersect import (
    gather_rows, hit_positions, one_hot_idx, tri_constants, intersect,
)
from raytpu.ops.shade import composite, direct_light
from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

xs, ys = pixel_grid(cfg)


def render_custom(s, l, occlusion_fn=None, shade=True):
    consts = tri_constants(s, camera.pos)
    dirs = camera_ray_dirs(xs, ys, camera, cfg)
    hits = intersect(dirs, consts, use_pallas=True)
    pos = hit_positions(camera.pos, dirs, hits)
    idx = jnp.maximum(hits.idx, 0)
    T = s.num_triangles
    oh = one_hot_idx(idx, T)
    albedo = gather_rows(oh, s.color)
    if not shade:
        return jnp.where(hits.hit[:, None], albedo, 0.0).reshape(
            cfg.height, cfg.width, 3)
    n_dir = gather_rows(oh, s.normals())
    direct = direct_light(pos, idx, s, l, cfg, occlusion_fn=occlusion_fn,
                          n_dir=n_dir)
    color = composite(direct, albedo, hits.hit, cfg)
    return color.reshape(cfg.height, cfg.width, 3)


def mk(occ, shade=True):
    def loss(s, l):
        img = render_custom(s, l, occlusion_fn=occ, shade=shade)
        return jnp.mean((img - target) ** 2)
    return loss

timed_chain("custom full (sanity)", mk(None))
timed_chain("no shadow kernel (occ=False)",
            mk(lambda p, rd, r: jnp.zeros(r.shape, bool)))
timed_chain("no shading (albedo only)", mk(None, shade=False))
