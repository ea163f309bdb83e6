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


@dataclasses.dataclass(frozen=True)
class FitConfig:
    steps: int = 500
    lr_vertices: float = 1e-3
    lr_colors: float = 1e-2
    lr_lights: float = 1e-2
    renderer: str = "rasterize"  # or "raytrace"
    # (edge_sharpness, z_sharpness, fraction_of_steps) annealing stages.
    stages: tuple = ((10.0, 20.0, 0.5), (40.0, 200.0, 0.5))
    checkpoint_every: int = 100
    checkpoint_dir: str | None = None
    log_every: int = 50


class FitState(NamedTuple):
    scene: Scene
    lights: Lights
    opt_state: object
    step: jax.Array


class FitResult(NamedTuple):
    scene: Scene
    lights: Lights
    losses: np.ndarray


def _make_optimizer(fit_cfg: FitConfig):
    def label_fn(params):
        scene, lights = params
        return (
            Scene(v0="verts", v1="verts", v2="verts", color="colors",
                  active="frozen"),
            Lights(position="lights", color="lights", intensity="lights",
                   mask="frozen", jitter="frozen"),
        )

    return optax.multi_transform(
        {
            "verts": optax.adam(fit_cfg.lr_vertices),
            "colors": optax.adam(fit_cfg.lr_colors),
            "lights": optax.adam(fit_cfg.lr_lights),
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
        resume_from: str | None = None) -> FitResult:
    """Run the inverse-rendering fit. target: (H, W, 3) float array."""
    target = jnp.asarray(target, jnp.float32)
    render = _render_fn(fit_cfg.renderer)
    optimizer = _make_optimizer(fit_cfg)

    params = (scene0, lights0)
    opt_state = optimizer.init(params)
    start_step = 0
    if resume_from is not None:
        params, opt_state, start_step = load_checkpoint(
            resume_from, params, opt_state
        )

    losses = []
    step_counter = start_step
    for stage_i, (edge_s, z_s, frac) in enumerate(fit_cfg.stages):
        cfg = render_cfg.replace(
            mode="soft", soft_edge_sharpness=edge_s, soft_z_sharpness=z_s
        )
        n_steps = int(fit_cfg.steps * frac)

        @jax.jit
        def train_step(params, opt_state, _cfg=cfg):
            def loss_fn(p):
                s, l = p
                img = render(s, camera, l, _cfg)
                return jnp.mean((img - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(n_steps):
            params, opt_state, loss = train_step(params, opt_state)
            losses.append(float(loss))
            step_counter += 1
            if (fit_cfg.log_every
                    and step_counter % fit_cfg.log_every == 0):
                print(f"[fit] stage {stage_i} step {step_counter} "
                      f"loss {float(loss):.6f}", flush=True)
            if (fit_cfg.checkpoint_dir
                    and step_counter % fit_cfg.checkpoint_every == 0):
                save_checkpoint(
                    os.path.join(
                        fit_cfg.checkpoint_dir, f"ckpt_{step_counter}.npz"
                    ),
                    params, opt_state, step_counter,
                )

    scene, lights = params
    return FitResult(scene=scene, lights=lights,
                     losses=np.asarray(losses))


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
