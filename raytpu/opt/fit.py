"""Inverse rendering: fit scene + light parameters to a target image.

BASELINE config 4: "optimize triangle vertices + light params to match
reference screenshot.bmp via rasterizer grads". The reference has no
training of any kind — this is the new capability the differentiable
re-design buys (SURVEY.md §5 checkpoint row).

Pipeline: rasterize_soft (silhouette-aware gradients) under an MSE loss,
optax adam with parameter groups, optional sharpness annealing (raise the
soft temperatures across stages so the fit converges toward the hard
image), and npz checkpointing with exact resume.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raytpu.core.types import Camera, Lights, RenderConfig, Scene
from raytpu.utils.profiling import FrameTimer, log_metrics


@dataclasses.dataclass(frozen=True)
class FitConfig:
    steps: int = 500
    lr_vertices: float = 1e-3
    lr_colors: float = 1e-2
    lr_lights: float = 1e-2
    # Light COLOR gets its own group (defaults to lr_lights): channel-
    # equal light color is what keeps channel-equal albedos rendering to
    # channel-equal pixels, which the reference-screenshot class metric
    # (C = g==b, Y = r==g, W = all within band) depends on — freezing it
    # (0.0) preserves that structure exactly while position/intensity
    # still adapt brightness.
    lr_light_color: float | None = None
    # "adam" (default) or "sgd". adam's per-coordinate normalization
    # turns ANY nonzero gradient into a full lr-sized step — right for
    # the global fit, wrong for surgical polish phases where only the
    # parameters near a few target pixels should move (measured: a
    # masked-hinge vertex polish under adam drifts EVERY vertex at lr
    # scale and loses more cells than it fixes). sgd moves parameters
    # in proportion to their actual gradient.
    optimizer: str = "adam"
    # Proximal anchor: adds prox_to_init * sum(mean((p - p_init)^2))
    # over trainable params to the loss — a trust region around the
    # starting point for polish phases.
    prox_to_init: float = 0.0
    renderer: str = "rasterize"  # or "raytrace"
    # 'mse'    — plain image MSE.
    # 'chroma+edge' — chroma plus a chroma-GRADIENT term (weight 4.0):
    #            concentrates loss on region-boundary placement.
    # 'chroma' — brightness-robust: MSE on normalized chroma
    #            x / (sum_rgb(x) + 0.15) plus 0.05x image-MSE anchor. Use
    #            when the target's absolute lighting can't be reproduced
    #            (e.g. the reference screenshot from an older build —
    #            tests/test_reference_screenshot.py) and the signal that
    #            matters is color-region geometry.
    loss: str = "mse"
    # 'constant' or 'cosine' (decay to alpha*lr over `steps`). Constant-lr
    # adam DIVERGES on long runs once annealing sharpens the renderer —
    # the near-hard soft gradients are spiky and a fixed step walks
    # vertices out of the basin (measured: 3200-step constant-lr fit
    # ends WORSE than its 1600-step prefix).
    lr_schedule: str = "constant"
    lr_schedule_alpha: float = 0.05
    # (edge_sharpness, z_sharpness, fraction_of_steps) annealing stages.
    stages: tuple = ((10.0, 20.0, 0.5), (40.0, 200.0, 0.5))
    checkpoint_every: int = 100
    checkpoint_dir: str | None = None
    log_every: int = 50
    # Structured metrics: one JSON line per log_every steps
    # ({"step", "stage", "loss", "grad_norm", "mrays_per_s", "ms_per_step"})
    # via utils.profiling.log_metrics; stream defaults to stderr.
    metrics_stream: object = None
    # Dump the current render as BMP every N steps (0 = off) into
    # image_dump_dir (defaults to checkpoint_dir).
    image_dump_every: int = 0
    image_dump_dir: str | None = None
    # Re-initialize the optimizer at every annealing-stage boundary
    # (adam moments + cosine restart over the stage's own length). The
    # sharpness jump between stages changes gradient scale/direction;
    # stale adam moments from the previous surrogate bias the first
    # steps of the next one (cosine warm restarts, Loshchilov&Hutter).
    stage_reset: bool = False
    # Validation-style checkpoint selection: every eval_every steps call
    # eval_fn(scene, lights) -> float (HIGHER is better; e.g. a
    # hard-render agreement metric) and remember the best params. The
    # soft loss is a surrogate — its minimum need not coincide with the
    # hard-render optimum, so select on the real objective.
    eval_fn: Callable | None = None
    eval_every: int = 0
    # "last" returns the final params; "best" returns the eval_fn-best.
    select: str = "last"
    # Optional additive loss term: extra_loss(img) -> scalar, called on
    # the soft render inside the jitted step and ADDED to the base loss.
    # Lets callers align the surrogate with their true objective (e.g.
    # bench/fit_reference.py's class-margin hinge at the metric's
    # sampled pixels) without forking the training loop.
    extra_loss: Callable | None = None


class FitState(NamedTuple):
    scene: Scene
    lights: Lights
    opt_state: object
    step: jax.Array


class FitResult(NamedTuple):
    scene: Scene
    lights: Lights
    losses: np.ndarray
    # (step, score) pairs from eval_fn, empty when eval is off; the
    # returned params are the best-scoring ones iff select == "best".
    evals: tuple = ()
    best_score: float | None = None


def _make_optimizer(fit_cfg: FitConfig, steps: int | None = None):
    def label_fn(params):
        scene, lights = params
        return (
            Scene(v0="verts", v1="verts", v2="verts", color="colors",
                  active="frozen"),
            Lights(position="lights", color="light_color",
                   intensity="lights", mask="frozen", jitter="frozen"),
        )

    def lr(base):
        if fit_cfg.lr_schedule == "cosine":
            return optax.cosine_decay_schedule(
                base, decay_steps=max(steps or fit_cfg.steps, 1),
                alpha=fit_cfg.lr_schedule_alpha,
            )
        if fit_cfg.lr_schedule != "constant":
            raise ValueError(
                f"unknown lr_schedule {fit_cfg.lr_schedule!r}")
        return base

    lr_lc = (fit_cfg.lr_lights if fit_cfg.lr_light_color is None
             else fit_cfg.lr_light_color)
    if fit_cfg.optimizer == "adam":
        opt = optax.adam
    elif fit_cfg.optimizer == "sgd":
        opt = optax.sgd
    else:
        raise ValueError(f"unknown optimizer {fit_cfg.optimizer!r}")
    return optax.multi_transform(
        {
            "verts": opt(lr(fit_cfg.lr_vertices)),
            "colors": opt(lr(fit_cfg.lr_colors)),
            "lights": opt(lr(fit_cfg.lr_lights)),
            "light_color": opt(lr(lr_lc)),
            "frozen": optax.set_to_zero(),
        },
        label_fn,
    )


def _render_fn(renderer: str) -> Callable:
    if renderer == "rasterize":
        from raytpu.render.soft import rasterize_soft

        return rasterize_soft
    if renderer == "raytrace":
        from raytpu.render.soft import raytrace_soft

        return raytrace_soft
    raise ValueError(f"unknown renderer {renderer!r}")


def fit(target, scene0: Scene, camera: Camera, lights0: Lights,
        render_cfg: RenderConfig, fit_cfg: FitConfig,
        resume_from: str | None = None, mesh=None) -> FitResult:
    """Run the inverse-rendering fit. target: (H, W, 3) float array.

    mesh: optional jax.sharding.Mesh (parallel.mesh.make_mesh) — the fit
    then trains through the SHARDED soft renderer (rows over 'data',
    triangle hypotheses over 'model'; parallel/render.py soft blocks,
    BASELINE configs 4/5 combined).
    """
    target = jnp.asarray(target, jnp.float32)
    render = _render_fn(fit_cfg.renderer)
    if mesh is not None:
        from raytpu.parallel.mesh import row_sharding

        target = jax.device_put(target, row_sharding(mesh))
    optimizer = _make_optimizer(fit_cfg)

    params = (scene0, lights0)
    opt_state = optimizer.init(params)
    start_step = 0
    if resume_from is not None:
        params, opt_state, start_step = load_checkpoint(
            resume_from, params, opt_state
        )

    params_init = params  # prox_to_init anchor (post-resume)
    losses = []
    evals = []
    best_score, best_params = None, params

    def _maybe_eval(step):
        nonlocal best_score, best_params
        if fit_cfg.eval_fn is None:
            return
        score = float(fit_cfg.eval_fn(params[0], params[1]))
        evals.append((step, score))
        if best_score is None or score > best_score:
            best_score, best_params = score, params

    step_counter = start_step
    rays_per_step = 2 * render_cfg.width * render_cfg.height  # fwd + bwd
    timer = FrameTimer(rays_per_frame=rays_per_step)
    for stage_i, (edge_s, z_s, frac) in enumerate(fit_cfg.stages):
        cfg = render_cfg.replace(
            mode="soft", soft_edge_sharpness=edge_s, soft_z_sharpness=z_s
        )
        n_steps = int(fit_cfg.steps * frac)
        if fit_cfg.stage_reset:
            optimizer = _make_optimizer(fit_cfg, steps=n_steps)
            opt_state = optimizer.init(params)

        if mesh is not None:
            from raytpu.parallel.render import make_sharded_soft_render

            sharded = make_sharded_soft_render(mesh, cfg,
                                               fit_cfg.renderer)
            stage_render = lambda s, l, _c=None: sharded(s, camera, l)  # noqa: E731
        else:
            stage_render = lambda s, l, _c=cfg: render(s, camera, l, _c)  # noqa: E731

        @jax.jit
        def train_step(params, opt_state, _render=stage_render):
            def loss_fn(p):
                s, l = p
                img = _render(s, l)

                def chroma(x):
                    return x / (
                        jnp.sum(x, axis=-1, keepdims=True) + 0.15
                    )

                def edge_term(a, b):
                    # Finite-difference image gradients of the CHROMA
                    # channels: silhouette misplacement shows up as a
                    # displaced edge LINE — a plain pixel loss spreads
                    # that error thin, the gradient loss concentrates it
                    # (fit_reference r4 analysis: the residual class
                    # errors are boundary lines).
                    ca, cb = chroma(a), chroma(b)
                    dya = ca[1:, :] - ca[:-1, :]
                    dyb = cb[1:, :] - cb[:-1, :]
                    dxa = ca[:, 1:] - ca[:, :-1]
                    dxb = cb[:, 1:] - cb[:, :-1]
                    return (jnp.mean((dya - dyb) ** 2)
                            + jnp.mean((dxa - dxb) ** 2))

                if fit_cfg.loss == "none":
                    # Pure extra_loss (+ prox) fit: polish phases that
                    # restart from eval-argmax-selected params must NOT
                    # re-expose them to the surrogate pixel loss — those
                    # params are off the surrogate's minimum by
                    # construction, so its gradient immediately drags
                    # them back (measured: every chroma-based polish
                    # lost ~1% agreement within 10 steps).
                    base = jnp.float32(0.0)
                elif fit_cfg.loss == "chroma":
                    base = (
                        jnp.mean((chroma(img) - chroma(target)) ** 2)
                        + 0.05 * jnp.mean((img - target) ** 2)
                    )
                elif fit_cfg.loss == "chroma+edge":
                    base = (
                        jnp.mean((chroma(img) - chroma(target)) ** 2)
                        + 0.05 * jnp.mean((img - target) ** 2)
                        + 4.0 * edge_term(img, target)
                    )
                else:
                    base = jnp.mean((img - target) ** 2)
                if fit_cfg.extra_loss is not None:
                    base = base + fit_cfg.extra_loss(img)
                if fit_cfg.prox_to_init > 0.0:
                    sq = jax.tree_util.tree_map(
                        lambda q, q0: (jnp.mean((q - q0) ** 2)
                                       if jnp.issubdtype(
                                           jnp.asarray(q).dtype,
                                           jnp.floating)
                                       else jnp.float32(0.0)),
                        p, params_init)
                    base = base + fit_cfg.prox_to_init * sum(
                        jax.tree_util.tree_leaves(sq))
                return base

            loss, grads = jax.value_and_grad(loss_fn)(params)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, loss,
                    gnorm)

        for _ in range(n_steps):
            with timer.frame():
                params, opt_state, loss, gnorm = jax.block_until_ready(
                    train_step(params, opt_state)
                )
            losses.append(float(loss))
            step_counter += 1
            if (fit_cfg.eval_every
                    and step_counter % fit_cfg.eval_every == 0):
                _maybe_eval(step_counter)
            if (fit_cfg.log_every
                    and step_counter % fit_cfg.log_every == 0):
                log_metrics(
                    step_counter, stream=fit_cfg.metrics_stream,
                    stage=stage_i, loss=loss, grad_norm=gnorm,
                    ms_per_step=timer.last_ms,
                    mrays_per_s=timer.mrays_per_s(),
                )
            if (fit_cfg.image_dump_every
                    and step_counter % fit_cfg.image_dump_every == 0):
                _dump_image(stage_render(params[0], params[1]),
                            fit_cfg, step_counter)
            if (fit_cfg.checkpoint_dir
                    and step_counter % fit_cfg.checkpoint_every == 0):
                save_checkpoint(
                    os.path.join(
                        fit_cfg.checkpoint_dir, f"ckpt_{step_counter}.npz"
                    ),
                    params, opt_state, step_counter,
                )

    if fit_cfg.eval_fn is not None and (
            not evals or evals[-1][0] != step_counter):
        _maybe_eval(step_counter)  # always score the final params
    if fit_cfg.select == "best" and best_score is not None:
        params = best_params
    elif fit_cfg.select not in ("last", "best"):
        raise ValueError(f"unknown select {fit_cfg.select!r}")
    scene, lights = params
    return FitResult(scene=scene, lights=lights,
                     losses=np.asarray(losses),
                     evals=tuple(evals), best_score=best_score)


def _dump_image(img, fit_cfg: FitConfig, step: int) -> None:
    """Periodic render dump (observability; SURVEY §5 metrics row)."""
    from raytpu.core.image import write_bmp

    out_dir = fit_cfg.image_dump_dir or fit_cfg.checkpoint_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    write_bmp(os.path.join(out_dir, f"fit_{step:06d}.bmp"),
              np.asarray(img))


# ---------------------------------------------------------------------------
# Checkpointing: flat-leaf npz with tree-structure check, exact resume.
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, params, opt_state, step: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten((params, opt_state))
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__step__"] = np.asarray(step)
    np.savez(path, **arrays)
    with open(path + ".json", "w") as f:
        json.dump({"treedef": str(treedef), "n_leaves": len(leaves),
                   "step": step}, f)


def load_checkpoint(path: str, params_template, opt_state_template):
    """Restore (params, opt_state, step); validates the tree structure
    against the provided templates."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(
        (params_template, opt_state_template)
    )
    n = len(leaves)
    n_stored = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_stored != n:
        raise ValueError(
            f"{path}: checkpoint has {n_stored} leaves but the current "
            f"(params, opt_state) template has {n} — the checkpoint "
            f"predates a FitConfig/optimizer layout change (e.g. the "
            f"light_color optimizer group) and cannot be resumed")
    stored = [data[f"leaf_{i}"] for i in range(n)]
    for i, (tpl, got) in enumerate(zip(leaves, stored)):
        if np.shape(tpl) != got.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {got.shape} != "
                f"template {np.shape(tpl)}"
            )
    restored = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(a) for a in stored]
    )
    params, opt_state = restored
    return params, opt_state, int(data["__step__"])
