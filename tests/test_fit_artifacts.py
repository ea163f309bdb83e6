"""Committed reference-fit artifacts (results/fit_reference/) stay
consistent with the claims made about them.

The README and loss_curve.json claim >= 98% class agreement; these
tests recompute the metric from the committed BMPs (no render needed)
so the claim can never drift from the artifact, and check the sidecar
files parse strictly."""

import json
import os

import numpy as np
import pytest

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "bench"))

from fit_reference import _load_params, class_agreement  # noqa: E402
from raytpu.core.image import read_bmp  # noqa: E402
from tests.conftest import reference_path  # noqa: E402

ART = os.path.join(os.path.dirname(__file__), "..", "results",
                   "fit_reference")
SCREENSHOT = reference_path("rasteriser", "screenshot.bmp")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(ART) and os.path.exists(SCREENSHOT)),
    reason="fit artifacts or reference screenshot unavailable")


def _summary():
    # parse_constant trips on NaN/Infinity tokens — the committed JSON
    # must stay STRICT (json.dump's default allow_nan would not be).
    with open(os.path.join(ART, "loss_curve.json")) as f:
        return json.loads(
            f.read(),
            parse_constant=lambda s: (_ for _ in ()).throw(
                ValueError(f"non-strict JSON token {s!r}")))


def test_loss_curve_json_strict_and_claims():
    d = _summary()
    agr = d["class_agreement"]
    assert agr["fitted"] >= 0.98, agr
    assert agr["perturbed_init"] < 0.9
    # The true scene is a REFERENCE POINT, not a ceiling: the committed
    # screenshot is from an older reference build, so the fit (which
    # optimizes toward the screenshot's classes directly via the
    # multi-scale hinge) can legitimately exceed the true scene's own
    # agreement — round 5 measured 0.9844 vs the true scene's 0.9832
    # (and 0.9900 in results/fit_reference_polish2). Sanity-bound both.
    assert 0.97 <= agr["true_scene"] <= 1.0
    assert agr["fitted"] >= agr["true_scene"] - 0.005
    assert d["eval_curve"], "eval curve missing"
    assert d["losses"][0] is not None and d["losses"][0] > d["losses"][-1]


def test_fitted_bmp_reproduces_recorded_agreement():
    d = _summary()
    ref = read_bmp(SCREENSHOT)
    fitted = read_bmp(os.path.join(ART, "fitted.bmp"))
    init = read_bmp(os.path.join(ART, "init.bmp"))
    assert abs(class_agreement(fitted, ref)
               - d["class_agreement"]["fitted"]) < 1e-9
    assert abs(class_agreement(init, ref)
               - d["class_agreement"]["perturbed_init"]) < 1e-9


def test_fitted_params_npz_loads_against_canonical_templates():
    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Lights

    scene, lights = _load_params(
        os.path.join(ART, "fitted_params.npz"),
        cornell_box(pad_to=32), Lights.single(capacity=1))
    assert np.isfinite(np.asarray(scene.v0)).all()
    assert np.isfinite(np.asarray(lights.position)).all()
    # Frozen-color invariant of the canonical run: albedos and light
    # color are bit-identical to their init (= TRUE) values.
    true_scene = cornell_box(pad_to=32)
    assert np.array_equal(np.asarray(scene.color),
                          np.asarray(true_scene.color))
    assert np.array_equal(np.asarray(lights.color),
                          np.asarray(Lights.single(capacity=1).color))
