"""Inverse-rendering fit (BASELINE config 4) and the CLI surface."""

import numpy as np
import pytest

from raytpu.core.cornell import cornell_box
from raytpu.core.image import read_bmp
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.opt.fit import FitConfig, fit, load_checkpoint, save_checkpoint
from raytpu.render.soft import rasterize_soft

SIZE = 40


def _target_and_cfg():
    scene = cornell_box()
    cam = Camera.make((0.0, 0.0, -3.0), focal=float(SIZE), y_scale=1.01)
    li = Lights.single(capacity=1)
    cfg = RenderConfig(width=SIZE, height=SIZE, mode="soft",
                       soft_edge_sharpness=40.0, soft_z_sharpness=200.0)
    target = np.asarray(rasterize_soft(scene, cam, li, cfg))
    return scene, cam, target


def test_fit_recovers_light():
    scene, cam, target = _target_and_cfg()
    li0 = Lights.single(capacity=1, intensity=8.0,
                        position=(0.2, -0.3, -0.5))
    res = fit(
        target, scene, cam, li0,
        RenderConfig(width=SIZE, height=SIZE, mode="soft"),
        FitConfig(steps=100, log_every=0),
    )
    assert res.losses[-1] < res.losses[0] * 0.2


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax

    scene = cornell_box()
    lights = Lights.single(capacity=1)
    params = (scene, lights)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, opt_state, 42)
    p2, o2, step = load_checkpoint(path, params, opt_state)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(p2[0].v0),
                                  np.asarray(scene.v0))

    # Shape-mismatch templates must be rejected.
    bad = (cornell_box(pad_to=64), lights)
    with pytest.raises(ValueError):
        load_checkpoint(path, bad, opt.init(bad))


def test_cli_render_commands(tmp_path):
    from raytpu.cli.main import main

    out = str(tmp_path / "r.bmp")
    main(["render", "-o", out, "--width", "32", "--height", "32"])
    img = read_bmp(out)
    assert img.shape == (32, 32, 3)
    assert img.max() > 0

    out2 = str(tmp_path / "z.bmp")
    main(["rasterize", "-o", out2, "--width", "32", "--height", "32",
          "--mode", "clean", "--no-frustum-cull"])
    assert read_bmp(out2).max() > 0

    out3 = str(tmp_path / "s.bmp")
    main(["starfield", "-o", out3, "--width", "32", "--height", "32"])
    assert read_bmp(out3).shape == (32, 32, 3)


def test_fit_metrics_stream_and_image_dumps(tmp_path):
    """fit() emits structured JSON metrics + periodic image dumps
    (observability wiring — SURVEY §5 metrics/logging row)."""
    import io
    import json
    import os

    scene, cam, target = _target_and_cfg()
    li0 = Lights.single(capacity=1, intensity=8.0,
                        position=(0.2, -0.3, -0.5))
    stream = io.StringIO()
    fit(
        target, scene, cam, li0,
        RenderConfig(width=SIZE, height=SIZE, mode="soft"),
        FitConfig(steps=8, log_every=2, metrics_stream=stream,
                  image_dump_every=4, image_dump_dir=str(tmp_path),
                  stages=((10.0, 20.0, 1.0),)),
    )
    records = [json.loads(line) for line in
               stream.getvalue().strip().splitlines()]
    assert len(records) == 4  # steps 2, 4, 6, 8
    for rec in records:
        for key in ("step", "stage", "loss", "grad_norm", "ms_per_step",
                    "mrays_per_s"):
            assert key in rec, f"missing {key}: {rec}"
        assert rec["grad_norm"] > 0.0
        assert np.isfinite(rec["loss"])
    assert records[0]["step"] == 2
    dumps = sorted(os.listdir(tmp_path))
    assert "fit_000004.bmp" in dumps and "fit_000008.bmp" in dumps
    assert read_bmp(str(tmp_path / "fit_000008.bmp")).shape == (SIZE, SIZE, 3)


def test_cli_multi_light_and_features(tmp_path):
    from raytpu.cli.main import main

    out = str(tmp_path / "m.bmp")
    main(["render", "-o", out, "--width", "24", "--height", "24",
          "--add-light", "0.4", "-0.4", "0.0", "1.0", "0.5", "0.5", "6.0",
          "--aa", "2", "--dof"])
    img = read_bmp(out)
    assert img.max() > 0


def test_fit_with_mesh():
    """fit(mesh=...) trains through the sharded soft renderer
    (VERDICT round-2 item 5: 'fit accepts a mesh')."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from raytpu.parallel.mesh import make_mesh

    scene, cam, target = _target_and_cfg()
    li0 = Lights.single(capacity=1, intensity=8.0,
                        position=(0.2, -0.3, -0.5))
    res = fit(
        target, scene, cam, li0,
        RenderConfig(width=SIZE, height=SIZE, mode="soft"),
        FitConfig(steps=60, log_every=0),
        mesh=make_mesh(data=4, model=2),
    )
    assert np.isfinite(res.losses[-1])
    assert res.losses[-1] < res.losses[0] * 0.3


def test_fit_stage_reset_and_best_select():
    """Warm restarts re-init adam at stage boundaries; select='best'
    returns the eval_fn-argmax params, not the final ones (the soft loss
    is a surrogate for hard-render agreement — bench/fit_reference.py)."""
    scene, cam, target = _target_and_cfg()
    li0 = Lights.single(capacity=1, intensity=8.0,
                        position=(0.2, -0.3, -0.5))

    seen = []

    def ev(s, l):
        # Score decreases, so 'best' must be the FIRST evaluated params.
        seen.append(float(np.asarray(l.intensity)[0]))
        return -float(len(seen))

    res = fit(
        target, scene, cam, li0,
        RenderConfig(width=SIZE, height=SIZE, mode="soft"),
        FitConfig(steps=8, log_every=0, lr_schedule="cosine",
                  stages=((10.0, 20.0, 0.5), (40.0, 200.0, 0.5)),
                  stage_reset=True, eval_fn=ev, eval_every=2,
                  select="best"),
    )
    assert res.best_score == -1.0
    assert [s for s, _ in res.evals] == [2, 4, 6, 8]
    # Returned intensity equals the stored first-eval intensity.
    assert float(np.asarray(res.lights.intensity)[0]) == seen[0]
