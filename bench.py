"""raytpu headline benchmark (driver-run).

Headline metric (BASELINE.json): Mrays/s/chip forward+backward at 512x512
Cornell box, hard-visibility raytrace ("clean" mode). One frame = 512^2
primary rays + 512^2 shadow rays (one light, hard shadows); a fwd+bwd step
is value_and_grad of an image MSE wrt scene + light parameters.

Timing methodology (round 5): every per-step number is a least-squares
SLOPE over >= 3 chain lengths of real chained steps (per-length batch
medians), with a leave-one-out half-spread uncertainty and a stall-
retry that ADDS batches when contamination pollutes a median (_slope;
unit-tested in tests/test_bench_slope.py). Rounds 1-3 divided one
chain's wall time by its iteration count, which charged the tunnel's
fixed ~8-15 ms per-call dispatch cost to the steps
(bench/megakernel_lab3.py measured a no-op kernel at "0.45 ms/iter"
under that method; the real kernel slope is 0.249 ms); round 4's
min-of-4 two-point slope was an extreme statistic that let single-batch
noise fabricate numbers (VERDICT r4 item 1). The slope is the marginal
steady-state step time — the number a training loop actually sees. Raw
batch wall times for EVERY length are recorded under "timing" so stalls
are visible ("spread", "retries").

The JSON line also records (VERDICT round-1 item 4 — honest accounting):
  fwd_ms             chained forward-only frame slope
  rasterize          hard rasterizer fwd+bwd (BASELINE config 2)
  soft_raytrace /    differentiable-mode fwd+bwd via the fused Pallas
  soft_rasterize     soft kernels
  pct_roof_meas      forward slope vs the MEASURED plane-tests-only roof
                     (bench/roofline.py sustained rate; bench/ROOFLINE.md)
  stl_intersect      9,216-tri brute vs chunk-culled forward sweep
  soft_stl           9,216-tri soft-raster fwd+bwd, culled vs brute
  timing/spread      raw batch times + relative spread (stall guard)

Robustness (VERDICT round-2 item 1 — the round-2 driver run timed out with
nothing on stdout): measurement runs in a time-boxed child that prints a
progressively-updated JSON line after EVERY completed metric; the parent
takes the child's LAST parseable line, so even a SIGKILLed child yields
its best-known result. The parent itself traps SIGTERM/SIGINT and emits
the best line seen so far before dying. Cold Pallas compiles through this
image's remote-compile tunnel have minutes-level variance, hence the
budgeted child + persistent compile cache (raytpu.utils.cache) + an XLA
fallback child; a fully-failed round still prints an in-process XLA
headline as a last resort.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the fastest CPU re-implementation we have of the same math —
the vectorized numpy oracle, forward-only, measured at 128x128 and scaled
linearly in ray count. GENEROUS to the baseline (numpy is vectorized
where the reference loops per pixel; backward would 2x+ its cost).

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

# Oracle-forward Mrays/s on this image's CPU (bench_cpu_oracle).
# Best-of measurements across rounds 1-3: 0.49-0.52 on an idle machine
# (slower readings were polluted by concurrent load) — the BEST case is
# used, which is GENEROUS to the baseline / conservative for
# vs_baseline. Hardcoded so the fallback paths never spend driver budget
# on the baseline; --measure-baseline re-derives it.
BASELINE_MRAYS = 0.52


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _lsq(xs, ys):
    """Least-squares slope + intercept for y = a + b*x."""
    n = len(xs)
    mx = sum(xs) / n
    my = sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
    return b, my - b * mx


def _slope(time_at, lengths):
    """Per-iteration ms via a REGRESSION over >= 3 chain lengths.

    Rounds 1-3 divided one chain's wall time by its iteration count,
    which silently charged the tunnel's FIXED per-call dispatch cost
    (~8 ms, bench/megakernel_lab3.py) to every step. Round 4 differenced
    the batch MINIMA of two lengths — which cancels the fixed cost but
    is an extreme-statistic estimator: one lucky-fast (or stalled) batch
    at either endpoint moves the slope by (noise / delta-iters), and the
    recorded BENCH_r04 forward (0.207 ms) disagreed with two validated
    manual runs (0.33 ms) for exactly that reason (VERDICT r4 item 1).

    Round 5: least-squares slope of the per-length batch MEDIAN over
    >= 3 chain lengths (median is robust on BOTH sides: stalls inflate,
    dispatch-overlap artifacts deflate), with an uncertainty that is the
    half-spread of leave-one-out slopes — refit with each single batch
    removed (any one batch's influence) and with each whole length
    removed (any one length's influence); the reported unc_ms is the
    max of the two half-spreads. Raw batch times for EVERY length are
    carried in the diag so the artifact is auditable (VERDICT r4
    weak #2: every row, not just the headline).

    time_at(n) -> list of per-call wall times (ms) for an n-iteration
    chain. Returns (slope_ms, diag).
    """
    import statistics

    lengths = sorted(lengths)
    assert len(lengths) >= 3, "regression slope needs >= 3 chain lengths"
    batches = {n: time_at(n) for n in lengths}

    def fit(drop_len=None, drop_batch=None):
        xs, ys = [], []
        for n in lengths:
            if n == drop_len:
                continue
            bs = list(batches[n])
            if drop_batch is not None and drop_batch[0] == n:
                bs = bs[:drop_batch[1]] + bs[drop_batch[1] + 1:]
            xs.append(n)
            ys.append(statistics.median(bs))
        return _lsq(xs, ys)

    def refit():
        slope, fixed = fit()
        loo = [fit(drop_batch=(n, k))[0]
               for n in lengths for k in range(len(batches[n]))]
        loo_len = [fit(drop_len=n)[0] for n in lengths]
        unc = max((max(loo) - min(loo)) / 2.0,
                  (max(loo_len) - min(loo_len)) / 2.0)
        return slope, fixed, unc

    slope, fixed, unc = refit()
    # Stall-retry: a burst of host/tunnel stalls can contaminate a
    # MAJORITY of one length's batches (observed: 3-of-6 ~200 ms stalls
    # in a 20-iter ladder), at which point the median itself is polluted
    # and the leave-one-out uncertainty blows past the slope. Adding
    # more data (never discarding any — every raw batch stays in the
    # diag below) restores the median's breakdown point; the retry only
    # helps if the new batches are consistent, so a genuinely noisy
    # measurement still reports its honest, large unc_ms.
    retries = 0
    while (slope <= 0 or unc > 0.25 * slope) and retries < 2:
        retries += 1
        for n in lengths:
            batches[n] = batches[n] + time_at(n)
        slope, fixed, unc = refit()
    if slope <= 0:  # pathological stall pattern; conservative bound
        slope = min(batches[lengths[-1]]) / lengths[-1]
    hi = batches[lengths[-1]]
    diag = {
        "slope_ms": round(slope, 4),
        "unc_ms": round(unc, 4),
        "fixed_ms": round(fixed, 2),
        "retries": retries,
        "lengths": lengths,
        "batches_ms": {str(n): [round(t, 2) for t in batches[n]]
                       for n in lengths},
        # typical-vs-best at the longest chain: a stalled batch shows in
        # the raw lists above without dominating the scalar.
        "spread": round(
            (statistics.median(hi) - min(hi)) / min(hi), 3),
    }
    return slope, diag


def _time_batches(fn, args_for_batch, batches=6, reps=2):
    """Per-call wall (ms): `reps` pipelined dispatches per batch, blocked
    once (overlapping the tunnel RTT as steady-state training would);
    args vary per (batch, rep) so the tunnel's value-replay cache can
    never serve a result (bench/timing_sanity.py trap)."""
    import jax

    out = None
    times = []
    for b in range(batches):
        t0 = time.time()
        for r in range(reps):
            out = fn(*args_for_batch(b * reps + r))
        jax.block_until_ready(out)
        times.append((time.time() - t0) / reps * 1e3)
    return times


def _chain_train(render_fn, params, lengths=(10, 30, 50), batches=6,
                 reps=2):
    """ms per fwd+bwd optimizer step: REAL optimizer steps chained in one
    executable (tiny lr so parameters stay put numerically), fixed
    dispatch cost regressed out (see _slope).

    The chain length is a RUNTIME argument (fori_loop, dynamic trip
    count), so one compile serves every length — a >=3-length regression
    costs the same compile budget round 4 spent on two."""
    import jax
    import jax.numpy as jnp
    import optax

    target = jax.block_until_ready(render_fn(*params))

    def loss_fn(p):
        return jnp.mean((render_fn(*p) - target) ** 2)

    vag = jax.value_and_grad(loss_fn)
    opt = optax.sgd(1e-9)

    @jax.jit
    def chained(p, os0, eps, iters):
        # eps (unique per call) perturbs the params at 1e-30 so no two
        # dispatches are value-identical (replay-cache guard).
        p = jax.tree_util.tree_map(lambda a: a + eps.astype(a.dtype), p)
        def body(_, carry):
            p_, os_, _l = carry
            loss, g = vag(p_)
            upd, os2 = opt.update(g, os_, p_)
            return (optax.apply_updates(p_, upd), os2, loss)
        return jax.lax.fori_loop(
            0, iters, body, (p, os0, jnp.float32(0.0)))

    os0 = opt.init(params)
    t0 = time.time()
    jax.block_until_ready(
        chained(params, os0, jnp.float32(0.0), lengths[0]))
    log(f"[bench] train chain compile: {time.time()-t0:.1f}s")

    def time_at(n):
        return _time_batches(
            chained,
            lambda k: (params, os0, jnp.float32(k) * 1e-30, n),
            batches=batches, reps=reps,
        )

    return _slope(time_at, lengths)


def _chain_fwd(render_fn, params, lengths=(10, 30, 50), batches=6,
               reps=2):
    """ms per forward frame, chained through the carry (the rendered
    image feeds back into the parameters at weight 1e-20, so the loop
    body cannot be hoisted as loop-invariant); fixed dispatch cost
    regressed out (see _slope). Dynamic trip count: one compile serves
    every chain length."""
    import jax
    import jax.numpy as jnp

    scene, rest = params[0], params[1:]

    @jax.jit
    def fwd_chain(s, eps, iters):
        s = jax.tree_util.tree_map(lambda a: a + eps.astype(a.dtype), s)
        def body(_, carry):
            img = render_fn(carry, *rest)
            mean = jnp.mean(img) * 1e-20
            return jax.tree_util.tree_map(
                lambda a: a + mean.astype(a.dtype), carry
            )
        return jax.lax.fori_loop(0, iters, body, s)

    t0 = time.time()
    jax.block_until_ready(fwd_chain(scene, jnp.float32(0.0), lengths[0]))
    log(f"[bench] fwd chain compile: {time.time()-t0:.1f}s")

    def time_at(n):
        return _time_batches(
            fwd_chain,
            lambda k: (scene, jnp.float32(k) * 1e-30, n),
            batches=batches, reps=reps,
        )

    return _slope(time_at, lengths)


# Sustained per-test rate of the fused kernel, MEASURED by differencing
# real kernels (bench/ROOFLINE.md). Round 5: the (8, tile/8) megakernel
# sustains ~90 Gtests/s (T-sweep slope 64->128 at 512^2, regression-
# timed; the round-4 (C, P)-layout kernels measured 81.5 at STL scale —
# that rate still applies to the streaming multi-chunk paths).
MEASURED_GTESTS_S = 90.0


def _roof_pct(fwd_ms, size, tris=32, unc_ms=0.0):
    """Forward-kernel utilization: plane-tests-only ideal (primary +
    shadow sweep at the kernel's measured sustained rate) over the
    measured marginal FORWARD time, reported as a point estimate AND a
    range over the slope uncertainty (VERDICT r4 item 1: gate the roof
    claim on the estimator's error bar). When the uncertainty exceeds
    half the slope the point estimate is withheld (None) — a roof claim
    from a noise-dominated slope is exactly the r4 artifact this guards
    against. The backward does no plane sweeps (analytic VJP), so the
    utilization statement is about the forward. bench/ROOFLINE.md
    carries the full accounting."""
    tests = 2.0 * size * size * tris
    ideal_ms = tests / (MEASURED_GTESTS_S * 1e9) * 1e3
    lo = round(ideal_ms / (fwd_ms + unc_ms) * 100.0, 1)
    pct = round(ideal_ms / fwd_ms * 100.0, 1)
    if unc_ms > 0.5 * fwd_ms or pct > 100.0:
        # > 100% of a MEASURED roof means the estimator under-measured
        # (e.g. the tunnel's intermittent ~20 ms pipelining floor
        # flattening short chains) — withhold the point estimate.
        return None, [lo, None]
    hi = round(ideal_ms / max(fwd_ms - unc_ms, 1e-9) * 100.0, 1)
    return pct, [lo, hi]


def _result_json(res, impl, complete, size=512):
    out = {
        "metric": (f"Mrays/s/chip fwd+bwd {size}x{size} Cornell "
                   f"(primary+shadow, {impl})"),
        "value": res["mrays"],
        "unit": "Mrays/s",
        "vs_baseline": round(res["mrays"] / BASELINE_MRAYS, 2),
        "impl": impl,
        "complete": complete,
    }
    out.update({k: v for k, v in res.items() if k != "mrays"})
    return json.dumps(out)


def bench_tpu(size=512, iters=20, use_pallas=None, report=None,
              core_only=False):
    """Measure all metrics, calling report(res_dict, complete) after each
    one so partial progress survives the process being killed."""
    import jax

    from raytpu.utils.cache import enable as enable_cache

    enable_cache()

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.render.rasterize import rasterize
    from raytpu.render.raytrace import raytrace_full
    from raytpu.render.soft import rasterize_soft, raytrace_soft

    report = report or (lambda res, complete: None)
    scene = cornell_box(pad_to=32)
    lights = Lights.single(capacity=1)
    cam_rt = Camera.raytracer_default()
    cam_rz = Camera.rasterizer_default()
    log(f"[bench] device: {jax.devices()[0]}")

    res = {}

    # --- headline: hard raytrace fwd+bwd -------------------------------
    # Chain lengths keep every length's EXECUTION time well above the
    # tunnel's intermittent ~20 ms pipelining floor (a short chain whose
    # wall is floor-bound flattens the regression and under-reports the
    # slope — observed live: a default-args run read fwd 0.144 ms /
    # "129.7% of roof" where three prior runs measured 0.19 ms).
    cfg = RenderConfig(width=size, height=size, mode="clean",
                       use_pallas=use_pallas)
    rt = lambda s, l: raytrace_full(s, cam_rt, l, cfg).image  # noqa: E731
    train_ms, diag = _chain_train(rt, (scene, lights),
                                  lengths=(20, 60, 100))
    rays = 2 * size * size
    res["train_ms"] = round(train_ms, 3)
    res["train_unc_ms"] = diag["unc_ms"]
    res["mrays"] = round(rays / train_ms / 1e3, 1)
    res["timing"] = diag  # regression slope + raw batches + spread
    res["spread"] = diag["spread"]
    log(f"[bench] raytrace fwd+bwd: {train_ms:.3f} +- "
        f"{diag['unc_ms']:.3f} ms -> {res['mrays']} Mrays/s "
        f"(fixed {diag['fixed_ms']} ms/call, spread {diag['spread']})")
    report(res, False)

    # The ~0.19 ms/frame forward needs long chains twice over: a 50-iter
    # chain carries only ~9 ms of signal against ~+-5 ms per-call noise,
    # AND chains under ~100 iters can sit on the tunnel's ~20 ms
    # pipelining floor (see the train-row note).
    fwd_ms, fdiag = _chain_fwd(rt, (scene, lights),
                               lengths=(50, 150, 250), batches=8)
    res["fwd_ms"] = round(fwd_ms, 3)
    res["fwd_mrays"] = round(rays / fwd_ms / 1e3, 1)
    res["fwd_timing"] = fdiag
    pct, rng = _roof_pct(fwd_ms, size, unc_ms=fdiag["unc_ms"])
    res["pct_roof_meas"] = pct
    res["pct_roof_range"] = rng
    log(f"[bench] raytrace fwd-only: {res['fwd_ms']} +- "
        f"{fdiag['unc_ms']:.3f} ms -> {res['fwd_mrays']} Mrays/s "
        f"({pct}% of plane-test roof, range {rng})")
    report(res, False)

    # --- hard rasterize fwd+bwd (BASELINE config 2) ---------------------
    rz = lambda s, l: rasterize(s, cam_rz, l, cfg)  # noqa: E731
    rz_ms, rz_diag = _chain_train(rz, (scene, lights),
                                  lengths=(20, 60, 100))
    res["rasterize"] = {
        "train_ms": round(rz_ms, 3),
        "mrays": round(size * size / rz_ms / 1e3, 1),
        "timing": rz_diag,
    }
    log(f"[bench] rasterize fwd+bwd: {rz_ms:.3f} ms -> "
        f"{res['rasterize']['mrays']} Mrays/s")
    report(res, False)

    # --- differentiable mode via the fused soft kernels -----------------
    cfg_soft = RenderConfig(width=size, height=size, mode="soft",
                            soft_edge_sharpness=40.0,
                            soft_z_sharpness=40.0, use_pallas=use_pallas)
    srt = lambda s, l: raytrace_soft(s, cam_rt, l, cfg_soft)  # noqa: E731
    srt_ms, srt_diag = _chain_train(srt, (scene, lights),
                                    lengths=(5, 15, 25))
    res["soft_raytrace"] = {
        "train_ms": round(srt_ms, 3),
        "mrays": round(rays / srt_ms / 1e3, 1),
        "timing": srt_diag,
    }
    log(f"[bench] soft raytrace fwd+bwd: {srt_ms:.3f} ms -> "
        f"{res['soft_raytrace']['mrays']} Mrays/s")
    report(res, False)

    srz = lambda s, l: rasterize_soft(s, cam_rz, l, cfg_soft)  # noqa: E731
    srz_ms, srz_diag = _chain_train(srz, (scene, lights),
                                    lengths=(5, 15, 25))
    res["soft_rasterize"] = {
        "train_ms": round(srz_ms, 3),
        "mrays": round(size * size / srz_ms / 1e3, 1),
        "timing": srz_diag,
    }
    log(f"[bench] soft rasterize fwd+bwd: {srz_ms:.3f} ms -> "
        f"{res['soft_rasterize']['mrays']} Mrays/s")
    report(res, True)

    if core_only:
        report(res, True)
        return res

    # --- the reference's toggled-on feature set (VERDICT r4 missing #1):
    # AA 3x3 sub-rays, 16 jittered soft-shadow samples per light, TWO
    # active lights, DoF post-blur — fwd+bwd through the multi-source
    # Pallas path (raytracer.cpp:37-43,180-199,608-656).
    try:
        res["full_features"] = _bench_full_features(
            size=size, use_pallas=use_pallas)
        ff = res["full_features"]
        log(f"[bench] full-featured fwd+bwd: {ff['train_ms']} ms -> "
            f"{ff['mrays']} Mrays/s ({ff['rays_per_frame_m']} Mrays/frame)")
    except Exception as e:  # noqa: BLE001
        log(f"[bench] full_features row failed: {type(e).__name__}: {e}")
    report(res, True)

    # --- BASELINE config 5's image size (VERDICT r4 missing #3): bare
    # headline config at 1024x1024, pinning O(R) scaling at the target
    # shape.
    try:
        cfg_1k = RenderConfig(width=1024, height=1024, mode="clean",
                              use_pallas=use_pallas)
        rt1k = lambda s, l: raytrace_full(  # noqa: E731
            s, cam_rt, l, cfg_1k).image
        ms_1k, diag_1k = _chain_train(rt1k, (scene, lights),
                                      lengths=(5, 15, 25))
        res["headline_1024"] = {
            "train_ms": round(ms_1k, 3),
            "mrays": round(2 * 1024 * 1024 / ms_1k / 1e3, 1),
            "timing": diag_1k,
        }
        log(f"[bench] 1024^2 fwd+bwd: {ms_1k:.3f} ms -> "
            f"{res['headline_1024']['mrays']} Mrays/s")
    except Exception as e:  # noqa: BLE001
        log(f"[bench] headline_1024 row failed: {type(e).__name__}: {e}")
    report(res, True)

    # --- soft at STL scale (VERDICT r3 item 3): 9,216-tri soft raster
    # fwd+bwd through the fused kernel, chunk-CULLED vs brute.
    try:
        soft_stl = _bench_soft_stl(size=size, use_pallas=use_pallas)
        res["soft_stl"] = soft_stl
        log(f"[bench] soft stl 9216-tri fwd+bwd: culled "
            f"{soft_stl['train_culled_ms']} ms, brute "
            f"{soft_stl['train_brute_ms']} ms "
            f"({soft_stl['speedup']}x)")
    except Exception as e:  # noqa: BLE001
        log(f"[bench] soft stl row failed: {type(e).__name__}: {e}")
    report(res, True)

    # --- soft RAYTRACE at STL scale (VERDICT r4 item 4): culled (bounded
    # background logit, round 5) vs brute fwd+bwd at 9,216 triangles.
    try:
        row = _bench_soft_raytrace_stl(size=size, use_pallas=use_pallas)
        res["soft_raytrace_stl"] = row
        log(f"[bench] soft raytrace stl 9216-tri fwd+bwd: culled "
            f"{row['train_culled_ms']} ms, brute "
            f"{row['train_brute_ms']} ms ({row['speedup']}x)")
    except Exception as e:  # noqa: BLE001
        log(f"[bench] soft raytrace stl row failed: "
            f"{type(e).__name__}: {e}")
    report(res, True)

    # --- STL scale: acceleration-structure headline (VERDICT r3 item 7):
    # brute vs chunk-culled fused intersect at 9,216 triangles. Driver-
    # recorded so the cull claim traces to an artifact, not a README.
    try:
        stl_row = _bench_stl_cull(size=size)
        res["stl_intersect"] = stl_row
        log(f"[bench] stl 9216-tri intersect: brute {stl_row['brute_ms']}"
            f" ms, culled {stl_row['culled_ms']} ms "
            f"({stl_row['speedup']}x)")
    except Exception as e:  # noqa: BLE001 — STL row must never kill the run
        log(f"[bench] stl row failed: {type(e).__name__}: {e}")
    report(res, True)

    # --- sharded paths on the real chip (VERDICT r3 item 4) -------------
    try:
        row = _bench_sharded_1x1(size=min(size, 256))
        res["sharded_1x1"] = row
        log(f"[bench] sharded (1,1) TPU mesh: clean maxdiff "
            f"{row['clean_maxdiff']:.2e}, soft maxdiff "
            f"{row['soft_maxdiff']:.2e}, ok={row['ok']}")
    except Exception as e:  # noqa: BLE001
        log(f"[bench] sharded 1x1 row failed: {type(e).__name__}: {e}")
    report(res, True)
    return res


def _bench_sharded_1x1(size=256):
    """Run the sharded (shard_map) render paths on a REAL (1,1) TPU mesh
    and compare against the unsharded renders (VERDICT r3 item 4: until
    round 4, every sharded execution ran in CPU interpret mode — this
    exercises real Mosaic lowering of the Pallas kernels INSIDE
    shard_map on the chip; no collectives at (1,1), same code path
    otherwise)."""
    import jax
    import numpy as np

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.parallel.mesh import make_mesh
    from raytpu.parallel.render import (
        make_sharded_render,
        make_sharded_soft_render,
    )
    from raytpu.render.raytrace import raytrace_full
    from raytpu.render.soft import rasterize_soft

    if jax.devices()[0].platform != "tpu":
        raise RuntimeError("needs the TPU backend")
    scene = cornell_box(pad_to=32)
    lights = Lights.single(capacity=1)
    cam_rt = Camera.raytracer_default()
    cam_rz = Camera.rasterizer_default()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])

    cfg = RenderConfig(width=size, height=size, mode="clean")
    img_s = np.asarray(make_sharded_render(mesh, cfg)(scene, cam_rt,
                                                      lights))
    img_u = np.asarray(raytrace_full(scene, cam_rt, lights, cfg).image)
    clean_diff = float(np.abs(img_s - img_u).max())

    cfg_soft = RenderConfig(width=size, height=size, mode="soft",
                            soft_edge_sharpness=40.0,
                            soft_z_sharpness=40.0)
    soft_fn = make_sharded_soft_render(mesh, cfg_soft,
                                       renderer="rasterize")
    img_ss = np.asarray(soft_fn(scene, cam_rz, lights))
    img_su = np.asarray(rasterize_soft(scene, cam_rz, lights, cfg_soft))
    soft_diff = float(np.abs(img_ss - img_su).max())
    return {
        "mesh": "1x1 tpu",
        "size": size,
        "clean_maxdiff": clean_diff,
        "soft_maxdiff": soft_diff,
        "ok": bool(clean_diff < 1e-5 and soft_diff < 1e-4),
    }


def _bench_full_features(size=512, use_pallas=None):
    """The reference's toggled-on feature set, fwd+bwd: AA_SAMPLES=3
    (9 sub-rays, `raytracer.cpp:37-38`), SOFT_SHADOWS_SAMPLES=16
    (`:40-41`), DOF_ENABLED (`:43,608-656`), and a second runtime light
    (`:180-199`) — through the multi-source fused Pallas path (one
    launch per sub-ray covers the primary hit + all 32 shadow sources).
    Rays/frame = R * 9 * (1 primary + 2 lights * 16 samples) = 297 R."""
    import jax

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.render.raytrace import raytrace_full

    scene = cornell_box(pad_to=32)
    cam = Camera.raytracer_default()
    lights = Lights.single(capacity=2, soft_samples=16).add(
        (0.4, -0.5, -0.7), (1.0, 1.0, 1.0), 7.0,
        key=jax.random.PRNGKey(1))
    cfg = RenderConfig(width=size, height=size, mode="clean",
                       aa_samples=3, soft_shadow_samples=16,
                       dof_enabled=True, use_pallas=use_pallas)

    def render(s, l):
        return raytrace_full(s, cam, l, cfg).image

    ms, diag = _chain_train(render, (scene, lights), lengths=(1, 3, 5),
                            batches=6, reps=1)
    n_sub = cfg.aa_samples ** 2
    rays = size * size * n_sub * (1 + 2 * cfg.soft_shadow_samples)
    return {
        "train_ms": round(ms, 3),
        "mrays": round(rays / ms / 1e3, 1),
        "rays_per_frame_m": round(rays / 1e6, 1),
        "aa_samples": cfg.aa_samples,
        "soft_shadow_samples": cfg.soft_shadow_samples,
        "lights": 2,
        "dof": True,
        "timing": diag,
    }


def _bench_soft_stl(size=512, use_pallas=None):
    """Soft (differentiable) rasterize fwd+bwd at STL scale, chunk-culled
    vs brute (kernels/soft_raster_pallas soft_keep_mask)."""
    from raytpu.core.stl import load_reference_model
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.kernels.soft_raster_pallas import rasterize_soft_pallas

    scene = load_reference_model(pad_to=9216)
    cam = Camera.rasterizer_default()
    lights = Lights.single(capacity=1)
    cfg = RenderConfig(width=size, height=size, mode="soft",
                       soft_edge_sharpness=40.0, soft_z_sharpness=40.0,
                       use_pallas=use_pallas)

    def culled(s, l):
        return rasterize_soft_pallas(s, cam, l, cfg, cull=True)

    def brute(s, l):
        return rasterize_soft_pallas(s, cam, l, cfg, cull=False)

    ms_c, diag_c = _chain_train(culled, (scene, lights),
                                lengths=(3, 6, 10), batches=4)
    ms_b, diag_b = _chain_train(brute, (scene, lights),
                                lengths=(1, 2, 4), batches=4, reps=1)
    return {
        "tris": scene.num_triangles,
        "train_culled_ms": round(ms_c, 3),
        "train_brute_ms": round(ms_b, 3),
        "speedup": round(ms_b / ms_c, 2),
        "timing_culled": diag_c,
        "timing_brute": diag_b,
    }


def _bench_soft_raytrace_stl(size=512, use_pallas=None):
    """Soft (differentiable) RAYTRACE fwd+bwd at STL scale: chunk-culled
    (round-5 bounded-background-logit restructure makes the screen-space
    cull sound for the raytracer too — see render/soft.py) vs brute."""
    from raytpu.core.stl import load_reference_model
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.render.soft import raytrace_soft

    scene = load_reference_model(pad_to=9216)
    cam = Camera.rasterizer_default()
    lights = Lights.single(capacity=1)
    cfg = RenderConfig(width=size, height=size, mode="soft",
                       soft_edge_sharpness=40.0, soft_z_sharpness=40.0,
                       use_pallas=use_pallas)

    def culled(s, l):
        return raytrace_soft(s, cam, l, cfg, cull=True)

    def brute(s, l):
        return raytrace_soft(s, cam, l, cfg, cull=False)

    ms_c, diag_c = _chain_train(culled, (scene, lights),
                                lengths=(2, 5, 8), batches=4, reps=1)
    ms_b, diag_b = _chain_train(brute, (scene, lights),
                                lengths=(1, 2, 3), batches=3, reps=1)
    return {
        "tris": scene.num_triangles,
        "train_culled_ms": round(ms_c, 3),
        "train_brute_ms": round(ms_b, 3),
        "speedup": round(ms_b / ms_c, 2),
        "timing_culled": diag_c,
        "timing_brute": diag_b,
    }


def _bench_stl_cull(size=512):
    """Brute vs culled fused closest-hit at STL scale (enemy1.stl padded
    to 9,216 tris), slope-timed forward sweeps."""
    from raytpu.core.stl import load_reference_model
    from raytpu.core.types import Camera, RenderConfig
    from raytpu.kernels.intersect_pallas import (
        intersect_pallas,
        intersect_pallas_culled,
    )
    from raytpu.ops.intersect import tri_constants
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

    import jax

    scene = load_reference_model(pad_to=9216)
    cam = Camera.rasterizer_default()
    cfg = RenderConfig(width=size, height=size)
    xs, ys = pixel_grid(cfg)
    dirs = jax.block_until_ready(camera_ray_dirs(xs, ys, cam, cfg))
    consts = tri_constants(scene, cam.pos)

    def brute(d):
        return intersect_pallas(d, consts)

    def culled(d):
        return intersect_pallas_culled(
            d, consts, cam.pos, scene.v0, scene.v1, scene.v2,
            image_hw=(size, size))

    ms_b, diag_b = _chain_fwd(lambda d: brute(d).t, (dirs,),
                              lengths=(3, 6, 10), batches=4)
    ms_c, diag_c = _chain_fwd(lambda d: culled(d).t, (dirs,),
                              lengths=(5, 15, 25), batches=4)
    return {
        "tris": scene.num_triangles,
        "brute_ms": round(ms_b, 3),
        "culled_ms": round(ms_c, 3),
        "speedup": round(ms_b / ms_c, 2),
        "timing_brute": diag_b,
        "timing_culled": diag_c,
    }


def bench_cpu_oracle(size=128):
    """Numpy-oracle forward at `size`, scaled to 512^2 ray count."""
    from raytpu.core.cornell import cornell_box_numpy
    from raytpu.oracle import raytracer_oracle as oracle

    arrays = cornell_box_numpy()
    t0 = time.time()
    oracle.render(arrays, width=size, height=size)
    dt = time.time() - t0
    rays = 2 * size * size
    mrays = rays / dt / 1e6
    log(f"[bench] numpy oracle fwd @ {size}^2: {dt*1e3:.0f} ms "
        f"-> {mrays:.2f} Mrays/s (fwd only)")
    return mrays


def _run_child(impl, timeout, size=512, iters=20, platform="default"):
    """Run a child bench and return its LAST parseable JSON line (the
    child reports progressively, so even a killed child yields its most
    recent completed metrics)."""
    import subprocess

    cmd = [sys.executable, __file__, "--impl", impl, "--progressive",
           "--size", str(size), "--iters", str(iters),
           "--platform", platform]
    if impl == "xla":
        # The fallback child only needs the headline rows (the STL and
        # sharded extras are Pallas-path capabilities and far too slow
        # on the XLA path to fit a fallback budget).
        cmd.append("--core-only")
    log(f"[bench] child: {impl} (budget {timeout:.0f}s)")
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
        stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
    except subprocess.TimeoutExpired as exc:
        stdout = exc.stdout or ""
        stderr = exc.stderr or ""
        rc = "timeout"
        if isinstance(stdout, bytes):
            stdout = stdout.decode(errors="replace")
        if isinstance(stderr, bytes):
            stderr = stderr.decode(errors="replace")
    best = None
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                best = json.loads(line)
            except json.JSONDecodeError:
                pass
    log(f"[bench] child {impl} rc={rc} "
        f"parsed={'yes' if best else 'no'}; stderr tail: {stderr[-500:]}")
    return best


class _Emitter:
    """Holds the best-known result line and guarantees it is printed to
    stdout exactly once, even on SIGTERM/SIGINT."""

    def __init__(self):
        self.line = None
        self.printed = False
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, self._on_signal)

    def update(self, res_dict):
        if res_dict is not None:
            self.line = json.dumps(res_dict)

    def _on_signal(self, signum, frame):
        log(f"[bench] got signal {signum}; emitting best-known result")
        self.emit()
        os._exit(0)

    def emit(self):
        if not self.printed and self.line is not None:
            print(self.line, flush=True)
            self.printed = True


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=["auto", "pallas", "xla"],
                    default="auto")
    ap.add_argument("--progressive", action="store_true",
                    help="print a JSON line after every completed metric "
                         "(child mode; the parent takes the last line)")
    ap.add_argument("--pallas-timeout", type=float, default=1200.0,
                    help="seconds allowed for the Pallas-path child "
                         "(warm runs take ~550 s; progressive reporting "
                         "preserves partial rows on a timeout)")
    ap.add_argument("--xla-timeout", type=float, default=240.0,
                    help="seconds allowed for the XLA fallback child")
    ap.add_argument("--measure-baseline", action="store_true",
                    help="re-measure the numpy-oracle baseline instead of "
                         "using the hardcoded constant")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--core-only", action="store_true",
                    help="headline rows only (skip STL + sharded extras)")
    ap.add_argument("--platform", choices=["default", "cpu"],
                    default="default",
                    help="cpu = force the CPU backend (smoke tests; env "
                         "vars alone cannot override this image's "
                         "sitecustomize pin)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    global BASELINE_MRAYS
    if args.measure_baseline:
        BASELINE_MRAYS = bench_cpu_oracle()

    if args.impl in ("pallas", "xla"):
        use_pallas = args.impl == "pallas"
        if args.progressive:
            def report(res, complete):
                print(_result_json(res, args.impl, complete,
                                   size=args.size), flush=True)
            bench_tpu(size=args.size, iters=args.iters,
                      use_pallas=use_pallas, report=report,
                      core_only=args.core_only)
        else:
            res = bench_tpu(size=args.size, iters=args.iters,
                            use_pallas=use_pallas,
                            core_only=args.core_only)
            print(_result_json(res, args.impl, True, size=args.size),
                  flush=True)
        return

    # auto: the fused Pallas kernels are ~3x faster but their first
    # (uncached) compile through this image's remote-compile tunnel has
    # minutes-level variance — run them in a time-boxed child that
    # reports progressively, fall back to the XLA path, and as a last
    # resort measure the XLA headline in-process. Whatever happens, ONE
    # JSON line reaches stdout (SIGTERM included).
    emitter = _Emitter()

    pallas = _run_child("pallas", args.pallas_timeout,
                        size=args.size, iters=args.iters,
                        platform=args.platform)
    emitter.update(pallas)
    if pallas is not None and pallas.get("complete"):
        emitter.emit()
        return

    # Pallas incomplete: its headline (if measured) is still the best
    # number, but try the XLA child for a complete record; keep whichever
    # line carries a headline value, preferring the faster one.
    xla = _run_child("xla", args.xla_timeout,
                     size=args.size, iters=args.iters,
                     platform=args.platform)
    if xla is not None:
        if pallas is None or xla.get("value", 0) >= pallas.get("value", 0):
            emitter.update(xla)
    if emitter.line is not None:
        emitter.emit()
        return

    # Both children produced nothing: in-process XLA, reporting into the
    # emitter so a mid-run SIGTERM still yields the completed metrics.
    log("[bench] both children empty; in-process XLA")
    def report(res, complete):
        emitter.update(json.loads(
            _result_json(res, "xla", complete, size=args.size)))
    bench_tpu(size=args.size, iters=args.iters,
              use_pallas=False, report=report)
    emitter.emit()


if __name__ == "__main__":
    main()
