"""Sharded rendering + training step (shard_map over a TPU mesh).

SPMD re-design of the reference's OpenMP row loop (`raytracer.cpp:557`;
SURVEY.md §5.8):

  * image rows are sharded over the mesh's 'data' axis — each device
    renders a contiguous row block (the reference's ``parallel for`` over
    scanlines, minus the shared-memory races by construction);
  * triangles are sharded over the 'model' axis — each device intersects
    its triangle block, and the global closest hit is merged with an
    `all_gather` over the axis (the reduction analog of the reference's
    per-triangle loop); shadow occlusion distances merge with `pmin`;
  * scene attribute arrays stay replicated (they are tiny next to the
    per-ray work), so winner gathers are local;
  * the training loss is `psum`'d over 'data' and `pmean`'d over 'model',
    and `jax.grad` through the shard_map produces replicated parameter
    gradients with the cross-device reductions inserted by JAX — the psum
    overlap with backward compute is XLA's scheduling job (BASELINE
    config 5).

DoF is intentionally not part of the sharded step (its 8x8 window would
need a halo exchange across row shards; it is a post-process — apply it
after gathering the image if needed).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from raytpu.core.types import Camera, Lights, RenderConfig, Scene
from raytpu.ops.intersect import intersect, tri_constants
from raytpu.ops.shade import composite, direct_light
from raytpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_F32MAX = jnp.float32(3.4028235e38)


def _scene_block(scene: Scene, axis_name: str) -> tuple[Scene, jax.Array]:
    """This shard's contiguous triangle block (sliced from the replicated
    scene) and its global base index."""
    mi = jax.lax.axis_index(axis_name)
    nm = jax.lax.axis_size(axis_name)
    T = scene.num_triangles
    if T % nm != 0:
        raise ValueError(
            f"triangle count {T} not divisible by model axis {nm}; "
            "use Scene.pad_to"
        )
    tb = T // nm
    base = mi * tb

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, base, tb, axis=0)

    return Scene(v0=sl(scene.v0), v1=sl(scene.v1), v2=sl(scene.v2),
                 color=sl(scene.color), active=sl(scene.active)), base


def _merged_intersect(start, dirs, block: Scene, base, cfg: RenderConfig,
                      axis_name: str):
    """Closest hit against the FULL scene from per-shard triangle blocks.

    Local closest hits (t, global idx) are all_gathered over the model axis
    and merged in ascending block order with the reference's
    last-wins-on-ties rule (`raytracer.cpp:243`).
    Returns (t, idx, hit) with t = ray parameter.
    """
    h = intersect(dirs, tri_constants(block, start),
                  tri_chunk=cfg.tri_chunk, use_pallas=cfg.pallas_enabled)
    t_local = jnp.where(h.hit, h.t, _F32MAX)
    idx_local = jnp.where(h.hit, h.idx + base, -1)
    ts = jax.lax.all_gather(t_local, axis_name)      # (nm, R)
    idxs = jax.lax.all_gather(idx_local, axis_name)  # (nm, R)

    best_t = ts[0]
    best_idx = idxs[0]
    for m in range(1, ts.shape[0]):
        upd = ts[m] <= best_t  # later (higher-index) blocks win ties
        best_t = jnp.where(upd, ts[m], best_t)
        best_idx = jnp.where(upd, idxs[m], best_idx)
    hit = best_t < _F32MAX
    return best_t, jnp.where(hit, best_idx, -1), hit


def _block_grid(cfg: RenderConfig, y0, rows: int):
    """Pixel grid for rows [y0, y0 + rows)."""
    ys, xs = jnp.meshgrid(
        y0 + jnp.arange(rows, dtype=jnp.float32),
        jnp.arange(cfg.width, dtype=jnp.float32),
        indexing="ij",
    )
    return xs.reshape(-1), ys.reshape(-1)


def render_block(scene: Scene, camera: Camera, lights: Lights,
                 cfg: RenderConfig, y0, rows: int) -> jax.Array:
    """Render a row block inside shard_map (data+model sharded).

    Single primary sample (no AA axis in the sharded step yet), hard
    shadows, no DoF. Returns (rows * W, 3).
    """
    from raytpu.render.raytrace import camera_ray_dirs

    xs, ys = _block_grid(cfg, y0, rows)
    dirs = camera_ray_dirs(xs, ys, camera, cfg)
    block, base = _scene_block(scene, MODEL_AXIS)

    t, idx, hit = _merged_intersect(
        camera.pos, dirs, block, base, cfg, MODEL_AXIS
    )
    t_safe = jnp.where(hit, t, 0.0)
    pos = camera.pos[None, :] + t_safe[:, None] * dirs
    idx_safe = jnp.maximum(idx, 0)

    def occlusion_fn(light_pos, delta, r):
        # Unnormalized shadow direction: ray parameter is a fraction of the
        # light distance, so occlusion is t < 0.99 (see ops/shade.py).
        sh = intersect(delta, tri_constants(block, light_pos),
                       tri_chunk=cfg.tri_chunk,
                       use_pallas=cfg.pallas_enabled)
        d_local = jnp.where(sh.hit, sh.t, _F32MAX)
        # all_gather + local min rather than lax.pmin: pmin has no JAX
        # differentiation rule, and this sits inside the training step's
        # backward even though the boolean result carries no gradient.
        d_min = jnp.min(jax.lax.all_gather(d_local, MODEL_AXIS), axis=0)
        return d_min < jnp.float32(0.99)

    direct = direct_light(pos, idx_safe, scene, lights, cfg,
                          occlusion_fn=occlusion_fn)
    albedo = scene.color[idx_safe]
    return composite(direct, albedo, hit, cfg)


class TrainState(NamedTuple):
    scene: Scene
    lights: Lights
    opt_state: object


def _resolve_pallas_for_mesh(mesh, cfg: RenderConfig) -> RenderConfig:
    """cfg.use_pallas=None means 'auto by backend' — but the mesh may live
    on different devices than the default backend (e.g. virtual CPU
    devices for the multichip dryrun while the default is the TPU).
    Resolve against the mesh's own devices."""
    if cfg.use_pallas is None:
        platform = mesh.devices.flat[0].platform
        cfg = cfg.replace(use_pallas=(platform == "tpu"))
    return cfg


def make_sharded_render(mesh, cfg: RenderConfig):
    """jit-compiled sharded forward render: returns (H, W, 3) image sharded
    row-wise over the data axis."""
    cfg = _resolve_pallas_for_mesh(mesh, cfg)
    nd = mesh.shape[DATA_AXIS]
    if cfg.height % nd != 0:
        raise ValueError(f"height {cfg.height} not divisible by {nd}")
    rows = cfg.height // nd

    def _block(scene, camera, lights):
        di = jax.lax.axis_index(DATA_AXIS)
        color = render_block(scene, camera, lights, cfg, di * rows, rows)
        return color.reshape(rows, cfg.width, 3)

    smapped = shard_map(
        _block,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_sharded_train_step(mesh, cfg: RenderConfig, optimizer):
    """Sharded inverse-rendering train step (BASELINE configs 4/5).

    params = (scene, lights) replicated; target (H, W, 3) sharded over rows.
    loss = mean squared error to the target image. Returns
    (train_step, loss_fn) — both jit-compiled for the mesh.
    """
    cfg = _resolve_pallas_for_mesh(mesh, cfg)
    nd = mesh.shape[DATA_AXIS]
    if cfg.height % nd != 0:
        raise ValueError(f"height {cfg.height} not divisible by {nd}")
    rows = cfg.height // nd
    denom = jnp.float32(cfg.height * cfg.width * 3)

    def _local_loss(scene, lights, camera, target_block):
        di = jax.lax.axis_index(DATA_AXIS)
        color = render_block(scene, camera, lights, cfg, di * rows, rows)
        img_block = color.reshape(rows, cfg.width, 3)
        l = jnp.sum((img_block - target_block) ** 2)
        l = jax.lax.psum(l, DATA_AXIS) / denom
        l = jax.lax.pmean(l, MODEL_AXIS)
        return l

    smapped = shard_map(
        _local_loss,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS, None, None)),
        out_specs=P(),
        check_vma=False,
    )

    def loss_fn(params, camera, target):
        scene, lights = params
        return smapped(scene, lights, camera, target)

    @jax.jit
    def train_step(state: TrainState, camera: Camera, target):
        params = (state.scene, state.lights)
        loss, grads = jax.value_and_grad(loss_fn)(params, camera, target)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              params)
        import optax

        scene, lights = optax.apply_updates(params, updates)
        return TrainState(scene=scene, lights=lights,
                          opt_state=opt_state), loss

    return train_step, jax.jit(loss_fn)
