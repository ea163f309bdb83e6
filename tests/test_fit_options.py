"""Fit-loop options added for the metric-aligned reference-fit polish:
per-group lr freezing (incl. the split light_color group), optimizer
'sgd', loss 'none' (pure extra_loss), and the prox_to_init trust region.

These are the levers behind the 98% reference-fit result
(bench/fit_reference.py; see README's inverse-rendering section for the
measured failure modes each one exists to avoid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.core.cornell import cornell_box
from raytpu.opt.fit import FitConfig, fit
from raytpu.render.raytrace import raytrace

SIZE = 24


@pytest.fixture(scope="module")
def target():
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="soft")
    return np.asarray(raytrace(cornell_box(), Camera.raytracer_default(),
                               Lights.single(capacity=1), cfg))


def _perturbed_lights():
    l0 = Lights.single(capacity=1)
    return Lights(position=l0.position, color=l0.color.at[0, 0].set(0.9),
                  intensity=l0.intensity, mask=l0.mask, jitter=l0.jitter)


def _run(target, **kw):
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="soft")
    # Default (100, 100) sharpness: at very soft settings the raytrace
    # path's optical-depth shadow saturates (every triangle's sigmoid
    # tail contributes, T = exp(-16*od) underflows to exactly 0) and the
    # direct term — hence ALL light gradients — vanishes; see
    # render/soft.py::_soft_shadow_factor. These tests probe the
    # optimizer wiring, so they need live light gradients.
    fc = FitConfig(steps=3, renderer="raytrace", loss=kw.pop("loss", "mse"),
                   stages=((100.0, 100.0, 1.0),), log_every=0, **kw)
    s0 = cornell_box()
    l0 = _perturbed_lights()
    r = fit(target, s0, Camera.raytracer_default(), l0, cfg, fc)
    return {
        "dcolor": float(np.abs(np.asarray(r.scene.color)
                               - np.asarray(s0.color)).max()),
        "dlight_color": float(np.abs(np.asarray(r.lights.color)
                                     - np.asarray(l0.color)).max()),
        "dverts": float(np.abs(np.asarray(r.scene.v0)
                               - np.asarray(s0.v0)).max()),
        "losses": r.losses,
    }


def test_default_all_groups_move(target):
    d = _run(target)
    assert d["dcolor"] > 0 and d["dlight_color"] > 0 and d["dverts"] > 0


def test_freeze_colors_and_light_color(target):
    d = _run(target, lr_colors=0.0, lr_light_color=0.0)
    assert d["dcolor"] == 0.0 and d["dlight_color"] == 0.0
    assert d["dverts"] > 0  # vertices still train


def test_light_color_inherits_lr_lights(target):
    # lr_light_color=None (default) -> light color follows lr_lights.
    d = _run(target, lr_lights=0.0)
    assert d["dlight_color"] == 0.0 and d["dcolor"] > 0


def test_sgd_optimizer_decreases_loss(target):
    d = _run(target, optimizer="sgd", lr_vertices=1e-4, lr_lights=3e-3,
             lr_colors=1e-4, lr_light_color=3e-3)
    assert d["losses"][-1] < d["losses"][0]


def test_unknown_optimizer_raises(target):
    with pytest.raises(ValueError, match="unknown optimizer"):
        _run(target, optimizer="adagrad")


def test_loss_none_pure_extra(target):
    # loss='none' + no extra + prox -> identically zero loss, no motion.
    d = _run(target, loss="none", prox_to_init=5.0)
    assert d["dverts"] == 0.0 and all(l == 0.0 for l in d["losses"])


def test_loss_none_extra_drives_fit(target):
    tgt = jnp.asarray(target)

    def extra(img):
        return jnp.mean((img - tgt) ** 2)

    d = _run(target, loss="none", extra_loss=extra, optimizer="sgd",
             lr_vertices=1e-4, lr_lights=3e-3, lr_colors=1e-4,
             lr_light_color=3e-3)
    assert d["losses"][-1] < d["losses"][0]


def test_prox_penalizes_distance_from_start(target):
    # From a perturbed start with a huge prox weight, the prox term
    # dominates: loss stays > 0 and params are pulled toward the START
    # (not the render optimum) — vertex motion shrinks vs the no-prox run.
    tgt = jnp.asarray(target)

    def extra(img):
        return jnp.mean((img - tgt) ** 2)

    # Vertices-only at a stable sgd lr (the real polish configuration):
    # every trainable group is a spring under prox, and sgd oscillates
    # on any group whose lr * 2 * prox / leaf_size > 1, so the
    # color/light groups are frozen and the vertex lr kept small.
    frozen = dict(lr_colors=0.0, lr_lights=0.0, lr_light_color=0.0)
    free = _run(target, loss="none", extra_loss=extra, optimizer="sgd",
                lr_vertices=3e-4, **frozen)
    proxd = _run(target, loss="none", extra_loss=extra, optimizer="sgd",
                 lr_vertices=3e-4, prox_to_init=1e4, **frozen)
    assert proxd["losses"][0] == free["losses"][0]  # prox starts at 0
    assert proxd["dverts"] < free["dverts"]
