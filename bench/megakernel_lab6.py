"""Megakernel ILP experiment (VERDICT r4 item 6).

Round-4's measured megakernel verdict (bench/megakernel_lab4.py,
bench/ROOFLINE.md): the full fusion loses ~0.08 ms to the split design
because the per-RAY stages (winner gather, shading, compositing) operate
on (1, tile) rows — one sublane of each (8, 128) vreg occupied, 16 vregs
of ILP — and are latency-bound through the divide/sqrt chains. Its own
diagnosis names the untried fix: run the per-ray work at (8, tile/8)
sublane density (8x denser vregs, 8x deeper ILP).

A direct in-kernel reshape (1, tile) -> (8, tile/8) is REJECTED by this
Mosaic version ("infer-vector-layout: unsupported shape cast", tried at
both (8, 64) and (8, 256) minors), so variant B restructures instead:
the ray tile enters the kernel PRE-BLOCKED as (8, tile/8) rows (a free
XLA-side reshape), the sweeps become a Python loop over the C triangles
with (8, tile/8) blocks (same FLOPs, full vreg density), and the
shading epilogue runs natively at (8, tile/8).

  A  render_hard_fused as shipped ((1, tile) per-ray rows)
  B  (8, tile/8)-blocked variant (this file)
  C  the split design (raytrace_full default path) for reference

Slope-timed with bench.py's 3-length regression estimator.
Run: python bench/megakernel_lab6.py [--size 512]
"""

from __future__ import annotations

import argparse
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32MAX = 3.4028235e38


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fwd_kernel_blk8(blkp_s, blks_s, attrs_s, par_s, dirs_ref,
                     out_ref, *, C: int, ambient: float, parity: bool):
    """Fused hard render, per-ray work on (8, P8) blocks.

    Per-triangle constants and light/camera params arrive as SMEM
    scalar-prefetch arrays (Mosaic rejects (1, 1) -> (8, P8) vector
    broadcasts — "Broadcast in both sublanes and lanes" — but scalar *
    vector is native). dirs_ref: (24, P8) rows [dx x8 | dy x8 | dz x8];
    blkp_s/blks_s: flattened (4C, 3) chunk-blocked constants; attrs_s:
    flattened (2C, 3) [nrm | alb]; par_s: [cam3, light3, p_eff3, dof];
    out_ref: (32, P8) rows [c0 x8 | c1 x8 | c2 x8 | fd x8].
    """
    from raytpu.kernels.render_fused import _shade_rows

    dx = dirs_ref[0:8, :]
    dy = dirs_ref[8:16, :]
    dz = dirs_ref[16:24, :]

    def sweep(ref, shadow, ddx, ddy, ddz):
        best_t = jnp.full(ddx.shape, _F32MAX, jnp.float32)
        best_i = jnp.full(ddx.shape, -1, jnp.int32)
        occ = jnp.zeros(ddx.shape, jnp.bool_)
        for i in range(C):
            n0, n1, n2 = (ref[3 * i], ref[3 * i + 1], ref[3 * i + 2])
            c2 = [ref[3 * (C + i) + j] for j in range(3)]
            c3 = [ref[3 * (2 * C + i) + j] for j in range(3)]
            k0 = ref[3 * (3 * C + i)]
            denom = -(ddx * n0 + ddy * n1 + ddz * n2)
            nonpar = denom != 0.0
            rec = 1.0 / jnp.where(nonpar, denom, 1.0)
            t = k0 * rec
            u = (ddx * c2[0] + ddy * c2[1] + ddz * c2[2]) * rec
            v = (ddx * c3[0] + ddy * c3[1] + ddz * c3[2]) * rec
            ok = ((u + v <= 1.0) & (u >= 0.0) & (v >= 0.0)
                  & (t >= 0.0) & nonpar)
            if shadow:
                occ = occ | (ok & (t < 0.99))
            else:
                tm = jnp.where(ok, t, _F32MAX)
                upd = tm <= best_t  # later triangle wins ties (ref :243)
                best_t = jnp.where(upd, tm, best_t)
                best_i = jnp.where(upd, i, best_i)
        if shadow:
            return occ
        return best_t, best_i

    best_t, best_idx = sweep(blkp_s, False, dx, dy, dz)
    hit = best_t < _F32MAX
    tz = jnp.where(hit, best_t, 0.0)

    def par_get(r, c):
        if c == 0:
            return par_s[r]          # cam (r<3) / light (3<=r<6)
        if c == 1:
            return par_s[6 + r]      # p_eff
        return par_s[9]              # dof

    d2 = [
        (par_get(j, 0) + tz * dd) - par_get(3 + j, 0)
        for j, dd in ((0, dx), (1, dy), (2, dz))
    ]
    occ_b = sweep(blks_s, True, d2[0], d2[1], d2[2])

    # Winner gather: per-triangle select-accumulate at (8, P8).
    n_rows = [jnp.zeros_like(tz) for _ in range(3)]
    alb_rows = [jnp.zeros_like(tz) for _ in range(3)]
    for i in range(C):
        sel = best_idx == i
        for j in range(3):
            n_rows[j] = jnp.where(
                sel, attrs_s[3 * i + j], n_rows[j])
            alb_rows[j] = jnp.where(
                sel, attrs_s[3 * (C + i) + j], alb_rows[j])

    out = _shade_rows(dx, dy, dz, tz, hit, occ_b, n_rows, alb_rows,
                      par_get, ambient=ambient, parity=parity)
    for j in range(3):
        out_ref[8 * j:8 * (j + 1), :] = out[j]
    out_ref[24:32, :] = out[3]


def _blk8(a_t, tile_r):
    """(k, Rp) row-major -> (8k, Rp/8): per tile, each row becomes 8
    sublane rows of tile_r/8 columns (free XLA reshape/transpose)."""
    k, Rp = a_t.shape
    n_tiles = Rp // tile_r
    p8 = tile_r // 8
    a = a_t.reshape(k, n_tiles, 8, p8)
    return a.transpose(0, 2, 1, 3).reshape(k * 8, n_tiles * p8)


def _unblk8(a8, tile_r):
    """Inverse of _blk8 for one logical row group."""
    k8, cols = a8.shape
    k = k8 // 8
    p8 = tile_r // 8
    n_tiles = cols // p8
    a = a8.reshape(k, 8, n_tiles, p8)
    return a.transpose(0, 2, 1, 3).reshape(k, n_tiles * tile_r)


def fused_fwd_blk8(dirs_t, m, k0, valid, m_l, k0_l, nrm, alb, par, *,
                   tile_r: int, tri_chunk: int, ambient: float,
                   parity: bool):
    from raytpu.kernels.intersect_pallas import (
        _blocked_constants,
        _interpret_mode,
        _tight_chunk,
    )
    from raytpu.kernels.render_fused import _pad_tri

    Rp = dirs_t.shape[1]
    T = m.shape[0]
    C = _tight_chunk(T, tri_chunk)
    blk_p, _ = _blocked_constants(m, k0, valid, C)
    blk_s, _ = _blocked_constants(m_l, k0_l, valid, C)
    attrs = jnp.concatenate([_pad_tri(nrm, C), _pad_tri(alb, C)], axis=0)

    dirs8 = _blk8(dirs_t, tile_r)  # (24, Rp/8)
    p8 = tile_r // 8

    par_flat = jnp.concatenate(
        [par[0:3, 0], par[3:6, 0], par[0:3, 1], par[0:1, 2]])
    kernel = functools.partial(_fwd_kernel_blk8, C=C, ambient=ambient,
                               parity=parity)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Rp // tile_r,),
        in_specs=[
            pl.BlockSpec((24, p8), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, p8), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
    )
    out8 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, Rp // 8), jnp.float32),
        interpret=_interpret_mode(),
    )(blk_p.reshape(-1), blk_s.reshape(-1), attrs.reshape(-1), par_flat,
      dirs8)
    return out8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    from raytpu.utils.cache import enable as enable_cache

    enable_cache()

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.kernels.render_fused import _fused_fwd_raw, _params_block
    from raytpu.ops.intersect import tri_constants
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

    sys.path.insert(0, "/root/repo")
    from bench import _chain_fwd  # noqa: E402 (the bench.py estimator)

    size = args.size
    scene = cornell_box(pad_to=32)
    lights = Lights.single(capacity=1).compact()
    cam = Camera.raytracer_default()
    cfg = RenderConfig(width=size, height=size, mode="clean")
    xs, ys = pixel_grid(cfg)
    dirs = jax.block_until_ready(camera_ray_dirs(xs, ys, cam, cfg))
    consts = tri_constants(scene, cam.pos)
    consts_l = tri_constants(scene, lights.position[0])
    p_eff = lights.mask[0] * (lights.color[0] * lights.intensity[0])
    par = _params_block(cam.pos, lights.position[0], p_eff,
                        cam.dof_focus)
    nrm = scene.normals()

    def run_a(d_t):
        c, fd, _, _ = _fused_fwd_raw(
            d_t, consts.m, consts.k0, consts.valid, consts_l.m,
            consts_l.k0, nrm, scene.color, par,
            tile_r=args.tile, tri_chunk=512, ambient=0.2, parity=False)
        return c + fd  # consume both

    def run_b(d_t):
        return fused_fwd_blk8(
            d_t, consts.m, consts.k0, consts.valid, consts_l.m,
            consts_l.k0, nrm, scene.color, par,
            tile_r=args.tile, tri_chunk=512, ambient=0.2, parity=False)

    d_t = dirs.T
    ca, fda, _, _ = _fused_fwd_raw(
        d_t, consts.m, consts.k0, consts.valid, consts_l.m, consts_l.k0,
        nrm, scene.color, par, tile_r=args.tile, tri_chunk=512,
        ambient=0.2, parity=False)
    out8 = run_b(d_t)
    cb = _unblk8(out8[0:24], args.tile)
    fdb = _unblk8(out8[24:32], args.tile)
    import numpy as np

    diff = float(np.abs(np.asarray(ca) - np.asarray(cb)).max())
    diff_fd = float(np.abs(np.asarray(fda) - np.asarray(fdb)).max())
    log(f"[lab6] A-vs-B maxdiff color {diff:.3e} fd {diff_fd:.3e}")
    if args.check_only:
        print({"maxdiff": diff, "maxdiff_fd": diff_fd})
        return

    res = {"maxdiff_ab": diff}
    ms_a, diag_a = _chain_fwd(run_a, (d_t,), lengths=(10, 30, 50))
    res["fused_1row_ms"] = round(ms_a, 4)
    res["unc_1row"] = diag_a["unc_ms"]
    log(f"[lab6] A (1, tile) fused fwd: {ms_a:.4f} ms "
        f"+- {diag_a['unc_ms']:.4f}")
    ms_b, diag_b = _chain_fwd(run_b, (d_t,), lengths=(10, 30, 50))
    res["fused_8row_ms"] = round(ms_b, 4)
    res["unc_8row"] = diag_b["unc_ms"]
    log(f"[lab6] B (8, tile/8) fused fwd: {ms_b:.4f} ms "
        f"+- {diag_b['unc_ms']:.4f}")

    from raytpu.render.raytrace import raytrace_full

    def run_c(s):
        return raytrace_full(s, cam, lights, cfg).image

    ms_c, diag_c = _chain_fwd(run_c, (scene,), lengths=(10, 30, 50))
    res["split_full_fwd_ms"] = round(ms_c, 4)
    res["unc_split"] = diag_c["unc_ms"]
    log(f"[lab6] C split full fwd: {ms_c:.4f} ms "
        f"+- {diag_c['unc_ms']:.4f}")

    import json

    print(json.dumps(res))


if __name__ == "__main__":
    main()
