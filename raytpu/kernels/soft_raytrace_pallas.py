"""Fused soft-raytracer Pallas kernels with custom VJPs.

The differentiable raytracer (raytpu.render.soft.raytrace_soft — the
softmin-over-depth relaxation of the closest-hit test,
`raytracer.cpp:239`, plus a smooth shadow transmittance relaxing the
occlusion test `raytracer.cpp:307-315`) streams (R, C, 9) einsum
accumulators through HBM in its jnp form: ~16 ms fwd+bwd at 512^2 on one
v5e chip. Two fused kernels keep the aggregation in VMEM:

  PRIMARY   grid (ray_tile, tri_chunk), chunk fastest: per-chunk
            Möller–Trumbore t/u/v from a per-triangle table (the
            camera-origin terms cross(e2,b), cross(b,e1), n.b are
            precomputed in jnp — they are per-triangle constants for
            primary rays), online softmax over the round-5 logit
            zs/max(t|d|, t_near) + log_sigmoid(es*margin) + log(active)
            with the BACKGROUND AT LOGIT 0 (render.soft._T_NEAR note —
            the bounded form that makes chunk culling sound),
            9-channel attribute numerator. Outputs the normalized 9
            channels + (m, s).

  SHADOW    grid (source, ray_tile, tri_chunk): log-space transmittance
            log T = sum_t log(1 - occ + 1e-20), occ = sigmoid coverage x
            sigmoid(zs*(0.99 r - t_occ)) — the product form of the jnp
            path, accumulated as a sum so the backward pass needs no
            division by a possibly-underflowed partial product (a fully
            occluded ray saturates to grad 0 instead of NaN).

Backward passes recompute chunk terms and apply jax.vjp in-kernel (the
softmax shift m is a residual with dL/dm == 0 analytically — it cancels
between numerator and denominator). Per-TRIANGLE grads must accumulate
consecutively over ray tiles while per-RAY grads accumulate over triangle
chunks (Pallas TPU accumulates output blocks only across consecutive grid
steps) — resolved by keeping the full d-consts table VMEM-RESIDENT (its
output block index is pinned to (0, 0), so it is never flushed mid-grid;
each step accumulates its chunk's rows at a chunk-aligned dynamic sublane
offset). That makes the backward a SINGLE launch whose one jax.vjp yields
every input cotangent from one recompute:

  primary:  grid (tile, chunk) -> d consts (resident), d globals,
            d lights, d ray dirs (per-tile block)
  shadow:   grid (source, tile, chunk) -> d consts (resident), d source
            positions, d world (partial per source; summed outside)

Scenes whose d-consts table would crowd VMEM (> _FUSED_BWD_MAX_ROWS
16-col-equivalent rows, ~4 MB) fall back to the original two-launch
transposed-grid backward kept below (tables/chunk-major + rays/tile-major).

Differentiation boundary: tables built in jnp from Scene/Camera/Lights,
so autodiff chains end-to-end exactly as in soft_raster_pallas.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRI_COLS = 32
_SHW_COLS = 16
_BIG = 3.4028235e38

# Keep in sync with render.soft._OD_SCALE (shadow transmittance scale).
_OD_SCALE = 16.0

# Above this many 16-column triangle rows (scaled for wider tables) the
# whole-resident dc output of the fused single-launch backward would
# crowd VMEM (16 MB/core, minus streamed blocks and double buffering);
# fall back to the two-launch backward there.
_FUSED_BWD_MAX_ROWS = 65536


# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------

def primary_tri_constants(scene, start):
    """(T, 32) table for the primary kernel.

      0-2  n = cross(e1, e2)
      3-5  c2b = cross(e2, b),  b = start - v0   (`raytracer.cpp:225-239`
           via the matmul formulation of ops/intersect)
      6-8  cb1 = cross(b, e1)
      9    k0 = n . b
      10-12 shading normal (scene.normals(), the cross(e2,e1) quirk)
      13-15 albedo
      16   active
      17   dmin = max(|start - centroid| - r_tri, 0): per-triangle lower
           bound on the distance from the ray origin to any triangle
           point — floors the bounded depth logit for plane-extension
           pseudo-hits (round 5; render.soft raytrace_soft note)
      18-31 zero padding
    """
    e1 = scene.v1 - scene.v0
    e2 = scene.v2 - scene.v0
    b = start[None, :] - scene.v0
    n = jnp.cross(e1, e2)
    c2b = jnp.cross(e2, b)
    cb1 = jnp.cross(b, e1)
    k0 = jnp.sum(n * b, axis=-1)
    nrm = scene.normals()
    cen = (scene.v0 + scene.v1 + scene.v2) / 3.0
    r2t = jnp.maximum(
        jnp.maximum(jnp.sum((scene.v0 - cen) ** 2, axis=-1),
                    jnp.sum((scene.v1 - cen) ** 2, axis=-1)),
        jnp.sum((scene.v2 - cen) ** 2, axis=-1))
    oc = jnp.linalg.norm(cen - start[None, :], axis=-1)
    dmin = jnp.maximum(oc - jnp.sqrt(r2t + 1e-20), 0.0)
    cols = [
        n[:, 0], n[:, 1], n[:, 2],
        c2b[:, 0], c2b[:, 1], c2b[:, 2],
        cb1[:, 0], cb1[:, 1], cb1[:, 2],
        k0,
        nrm[:, 0], nrm[:, 1], nrm[:, 2],
        scene.color[:, 0], scene.color[:, 1], scene.color[:, 2],
        scene.active,
        dmin,
    ]
    zeros = jnp.zeros_like(k0)
    cols += [zeros] * (_PRI_COLS - len(cols))
    return jnp.stack(cols, axis=1)


def shadow_tri_constants(scene):
    """(T, 16) table for the shadow kernel (source-independent):
    v0 (0-2), e1 (3-5), e2 (6-8), n (9-11), n.v0 (12), active (13)."""
    e1 = scene.v1 - scene.v0
    e2 = scene.v2 - scene.v0
    n = jnp.cross(e1, e2)
    cols = [
        scene.v0[:, 0], scene.v0[:, 1], scene.v0[:, 2],
        e1[:, 0], e1[:, 1], e1[:, 2],
        e2[:, 0], e2[:, 1], e2[:, 2],
        n[:, 0], n[:, 1], n[:, 2],
        jnp.sum(n * scene.v0, axis=-1),
        scene.active,
    ]
    zeros = jnp.zeros_like(cols[0])
    cols += [zeros] * (_SHW_COLS - len(cols))
    return jnp.stack(cols, axis=1)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _irr_cols(w, n_cols, lt, capacity):
    """Per-light irradiance at points w = [wx, wy, wz] ((1|C, P) rows)
    with normals n_cols = [(C,1)]*3. Mirrors ops.shade.irradiance_no_shadow
    (r = 0 guard included). Returns 3 rows shaped like w[0] * n_cols[0]."""
    n0, n1, n2 = n_cols
    irr = None
    for k in range(capacity):
        lk = lt[k:k + 1, :]
        d = [w[j] - lk[:, j:j + 1] for j in range(3)]
        r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        lit = r2 > 0.0
        r2s = jnp.where(lit, r2, 1.0)
        rrec = jax.lax.rsqrt(r2s)
        lam = jnp.maximum(-(d[0] * n0 + d[1] * n1 + d[2] * n2) * rrec, 0.0)
        # 1/r^2 as rrec^2 — avoids a per-pair VPU divide (~8 slots); the
        # (1, 1) light-constant product folds per chunk.
        base = jnp.where(
            lit,
            (lk[:, 7:8] * lk[:, 6:7] * jnp.float32(0.25 / math.pi))
            * lam * (rrec * rrec),
            0.0,
        )
        term = [base * lk[:, 3 + j:4 + j] for j in range(3)]
        irr = term if irr is None else [a + b for a, b in zip(irr, term)]
    return irr


# ---------------------------------------------------------------------------
# Primary kernel
# ---------------------------------------------------------------------------

def _primary_terms(cs, gl, lt, dx, dy, dz, *, es, zs, ambient, capacity,
                   t_near):
    """Per-(triangle, ray) depth logit, coverage + 9 attribute channels
    for one chunk (round-5 relaxation: inverse-depth logit with a
    background at 0, render.soft._T_NEAR note).
    cs: (C, 32); gl: (1, 16) = [start xyz, ...]; lt: (L, 8) (unused —
    kept for table-shape compatibility; shading now happens on the
    aggregate OUTSIDE the kernel); dx/dy/dz: (1, P) ray directions.
    Returns (logit, vals[9] = [albedo rgb, pos xyz, normal xyz]).
    """
    del lt, ambient, capacity

    def col(j):
        return cs[:, j:j + 1]

    def g(j):
        return gl[:, j:j + 1]

    denom = -(dx * col(0) + dy * col(1) + dz * col(2))
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    rec = 1.0 / safe
    t = col(9) * rec
    u = (dx * col(3) + dy * col(4) + dz * col(5)) * rec
    v = (dx * col(6) + dy * col(7) + dz * col(8)) * rec
    margin = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)

    # Behind-camera + near-parallel gate (render.soft._DENOM_EPS): the
    # MT quotients are clamp artifacts below the relative threshold.
    dn = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    nmag = jnp.sqrt(col(0) * col(0) + col(1) * col(1) + col(2) * col(2))
    hit_ok = (t > 1e-6) & (jnp.abs(denom) > 1e-3 * dn * nmag)

    # Bounded inverse depth from the ray-plane hit, floored by the
    # per-triangle dmin (col 17) — exact for true hits, caps
    # plane-extension pseudo-hits by the triangle's real proximity
    # (render.soft raytrace_soft note).
    dist = t * dn
    zinv = 1.0 / jnp.maximum(jnp.maximum(dist, col(17)), t_near)
    logit = (
        zs * jnp.where(hit_ok, zinv, 0.0)
        + jax.nn.log_sigmoid(es * margin)
        + jnp.log(col(16) + 1e-20)
    )
    logit = jnp.where(hit_ok, logit, -1e30)

    tp = jnp.where(hit_ok & (t < _BIG), t, 0.0)
    pos = [g(j) + tp * dd for j, dd in ((0, dx), (1, dy), (2, dz))]

    vals = [jnp.broadcast_to(col(13 + j), logit.shape) for j in range(3)]
    vals += pos
    vals += [jnp.broadcast_to(col(10 + j), logit.shape) for j in range(3)]
    return logit, vals


def _pri_fwd_kernel(dirs_ref, consts_ref, glob_ref, lights_ref,
                    out_ref, m_ref, s_ref, m_s, s_s, *acc_s,
                    es, zs, ambient, capacity, t_near):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    dx = dirs_ref[0:1, :]
    dy = dirs_ref[1:2, :]
    dz = dirs_ref[2:3, :]

    @pl.when(c == 0)
    def _():
        # Background hypothesis at logit 0 (black at infinity; mirrors
        # the rasterizer's cleared-to-0 depth buffer).
        m_s[:, :] = jnp.zeros_like(m_s[:, :])
        s_s[:, :] = jnp.ones_like(s_s[:, :])
        for a in acc_s:
            a[:, :] = jnp.zeros_like(a[:, :])

    logit, vals = _primary_terms(
        consts_ref[:, :], glob_ref[:, :], lights_ref[:, :], dx, dy, dz,
        es=es, zs=zs, ambient=ambient, capacity=capacity, t_near=t_near,
    )
    m = m_s[:, :]
    m_new = jnp.maximum(m, jnp.max(logit, axis=0, keepdims=True))
    scale = jnp.exp(m - m_new)
    w = jnp.exp(logit - m_new)
    m_s[:, :] = m_new
    s_s[:, :] = s_s[:, :] * scale + jnp.sum(w, axis=0, keepdims=True)
    for j, a in enumerate(acc_s):
        a[:, :] = a[:, :] * scale + jnp.sum(w * vals[j], axis=0,
                                            keepdims=True)

    @pl.when(c == n_chunks - 1)
    def _():
        rec = 1.0 / s_s[:, :]
        for j, a in enumerate(acc_s):
            out_ref[j:j + 1, :] = a[:, :] * rec
        m_ref[:, :] = m_s[:, :]
        s_ref[:, :] = s_s[:, :]


def _pri_fwd_kernel_masked(mask_ref, dirs_ref, consts_ref, glob_ref,
                           lights_ref, out_ref, m_ref, s_ref,
                           m_s, s_s, *acc_s,
                           es, zs, ambient, capacity, t_near):
    """Chunk-culled _pri_fwd_kernel: the per-chunk math runs under
    pl.when(keep); init and the final normalize stay unconditional.
    mask_ref: (n_tiles * n_chunks,) int32 scalar-prefetch keep mask
    (soft_rt_keep_mask)."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    keep = mask_ref[i * n_chunks + c] != 0

    @pl.when(c == 0)
    def _():
        m_s[:, :] = jnp.zeros_like(m_s[:, :])
        s_s[:, :] = jnp.ones_like(s_s[:, :])
        for a in acc_s:
            a[:, :] = jnp.zeros_like(a[:, :])

    @pl.when(keep)
    def _():
        dx = dirs_ref[0:1, :]
        dy = dirs_ref[1:2, :]
        dz = dirs_ref[2:3, :]
        logit, vals = _primary_terms(
            consts_ref[:, :], glob_ref[:, :], lights_ref[:, :],
            dx, dy, dz,
            es=es, zs=zs, ambient=ambient, capacity=capacity,
            t_near=t_near,
        )
        m = m_s[:, :]
        m_new = jnp.maximum(m, jnp.max(logit, axis=0, keepdims=True))
        scale = jnp.exp(m - m_new)
        w = jnp.exp(logit - m_new)
        m_s[:, :] = m_new
        s_s[:, :] = s_s[:, :] * scale + jnp.sum(w, axis=0, keepdims=True)
        for j, a in enumerate(acc_s):
            a[:, :] = a[:, :] * scale + jnp.sum(w * vals[j], axis=0,
                                                keepdims=True)

    @pl.when(c == n_chunks - 1)
    def _():
        rec = 1.0 / s_s[:, :]
        for j, a in enumerate(acc_s):
            out_ref[j:j + 1, :] = a[:, :] * rec
        m_ref[:, :] = m_s[:, :]
        s_ref[:, :] = s_s[:, :]


def _pri_bwd_fused_kernel(dirs_ref, m_ref, cot_ref,
                          consts_ref, glob_ref, lights_ref,
                          dc_ref, dg_ref, dl_ref, dd_ref, *,
                          es, zs, ambient, capacity, t_near, chunk):
    """Single-launch primary backward: one recompute + one jax.vjp per
    (tile, chunk) step yields ALL input cotangents — the two-launch split
    (tables then dirs) recomputed the chunk terms twice. Grid
    (n_tiles, n_chunks), chunk fastest:

      dc       (Tp, 32) whole-array VMEM-resident output (block index
               fixed at (0, 0)); per-step accumulate at a dynamic
               chunk-aligned sublane offset.
      dg, dl   whole-grid accumulated residents.
      dd       (3, tile_p) block per tile, accumulated over consecutive
               chunk steps.
    """
    i = pl.program_id(0)
    c = pl.program_id(1)
    m = m_ref[:, :]
    # Cotangent rows [d s, d acc_0..8] precombined OUTSIDE the kernel
    # (see soft_raster_pallas._bwd_kernel's note) — supports both
    # _primary_agg and the stats variant with one kernel.
    ds = cot_ref[0:1, :]
    da = [cot_ref[j + 1:j + 2, :] for j in range(9)]

    def f(cs, gl, lt, dx, dy, dz):
        logit, vals = _primary_terms(
            cs, gl, lt, dx, dy, dz,
            es=es, zs=zs, ambient=ambient, capacity=capacity, t_near=t_near,
        )
        w = jnp.exp(logit - m)
        outs = [jnp.sum(w, axis=0, keepdims=True)]
        outs += [jnp.sum(w * vals[j], axis=0, keepdims=True)
                 for j in range(9)]
        return tuple(outs)

    _, vjp_fn = jax.vjp(
        f, consts_ref[:, :], glob_ref[:, :], lights_ref[:, :],
        dirs_ref[0:1, :], dirs_ref[1:2, :], dirs_ref[2:3, :],
    )
    dcs, dgl, dlt, ddx, ddy, ddz = vjp_fn(tuple([ds] + da))

    first = (i == 0) & (c == 0)

    @pl.when(first)
    def _():
        dc_ref[:, :] = jnp.zeros_like(dc_ref[:, :])
        dg_ref[:, :] = jnp.zeros_like(dg_ref[:, :])
        dl_ref[:, :] = jnp.zeros_like(dl_ref[:, :])

    rows = pl.ds(c * chunk, chunk)
    dc_ref[rows, :] = dc_ref[rows, :] + dcs
    dg_ref[:, :] = dg_ref[:, :] + dgl
    dl_ref[:, :] = dl_ref[:, :] + dlt

    @pl.when(c == 0)
    def _():
        dd_ref[:, :] = jnp.zeros_like(dd_ref[:, :])

    dd_ref[0:1, :] = dd_ref[0:1, :] + ddx
    dd_ref[1:2, :] = dd_ref[1:2, :] + ddy
    dd_ref[2:3, :] = dd_ref[2:3, :] + ddz


def _pri_bwd_fused_kernel_masked(mask_ref, dirs_ref, m_ref, cot_ref,
                                 consts_ref, glob_ref, lights_ref,
                                 dc_ref, dg_ref, dl_ref, dd_ref, *,
                                 es, zs, ambient, capacity, t_near,
                                 chunk):
    """Chunk-culled _pri_bwd_fused_kernel: outputs zero-init
    unconditionally, the recompute + vjp + accumulate run under
    pl.when(keep). A culled (tile, chunk) pair's true gradient carries
    the same <= 1e-20-relative weight the forward dropped."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    keep = mask_ref[i * n_chunks + c] != 0

    first = (i == 0) & (c == 0)

    @pl.when(first)
    def _():
        dc_ref[:, :] = jnp.zeros_like(dc_ref[:, :])
        dg_ref[:, :] = jnp.zeros_like(dg_ref[:, :])
        dl_ref[:, :] = jnp.zeros_like(dl_ref[:, :])

    @pl.when(c == 0)
    def _():
        dd_ref[:, :] = jnp.zeros_like(dd_ref[:, :])

    @pl.when(keep)
    def _():
        m = m_ref[:, :]
        ds = cot_ref[0:1, :]
        da = [cot_ref[j + 1:j + 2, :] for j in range(9)]

        def f(cs, gl, lt, dx, dy, dz):
            logit, vals = _primary_terms(
                cs, gl, lt, dx, dy, dz,
                es=es, zs=zs, ambient=ambient, capacity=capacity,
                t_near=t_near,
            )
            w = jnp.exp(logit - m)
            outs = [jnp.sum(w, axis=0, keepdims=True)]
            outs += [jnp.sum(w * vals[j], axis=0, keepdims=True)
                     for j in range(9)]
            return tuple(outs)

        _, vjp_fn = jax.vjp(
            f, consts_ref[:, :], glob_ref[:, :], lights_ref[:, :],
            dirs_ref[0:1, :], dirs_ref[1:2, :], dirs_ref[2:3, :],
        )
        dcs, dgl, dlt, ddx, ddy, ddz = vjp_fn(tuple([ds] + da))

        rows = pl.ds(c * chunk, chunk)
        dc_ref[rows, :] = dc_ref[rows, :] + dcs
        dg_ref[:, :] = dg_ref[:, :] + dgl
        dl_ref[:, :] = dl_ref[:, :] + dlt
        dd_ref[0:1, :] = dd_ref[0:1, :] + ddx
        dd_ref[1:2, :] = dd_ref[1:2, :] + ddy
        dd_ref[2:3, :] = dd_ref[2:3, :] + ddz


def _pri_bwd_tables_kernel(dirs_ref, m_ref, cot_ref,
                           consts_ref, glob_ref, lights_ref,
                           dc_ref, dg_ref, dl_ref, *,
                           es, zs, ambient, capacity, t_near):
    c = pl.program_id(0)
    t = pl.program_id(1)
    dx = dirs_ref[0:1, :]
    dy = dirs_ref[1:2, :]
    dz = dirs_ref[2:3, :]
    m = m_ref[:, :]
    ds = cot_ref[0:1, :]
    da = [cot_ref[j + 1:j + 2, :] for j in range(9)]

    def f(cs, gl, lt):
        logit, vals = _primary_terms(
            cs, gl, lt, dx, dy, dz,
            es=es, zs=zs, ambient=ambient, capacity=capacity, t_near=t_near,
        )
        w = jnp.exp(logit - m)
        outs = [jnp.sum(w, axis=0, keepdims=True)]
        outs += [jnp.sum(w * vals[j], axis=0, keepdims=True)
                 for j in range(9)]
        return tuple(outs)

    _, vjp_fn = jax.vjp(
        f, consts_ref[:, :], glob_ref[:, :], lights_ref[:, :]
    )
    dcs, dgl, dlt = vjp_fn(tuple([ds] + da))

    @pl.when(t == 0)
    def _():
        dc_ref[:, :] = dcs

    @pl.when(t != 0)
    def _():
        dc_ref[:, :] = dc_ref[:, :] + dcs

    first = (c == 0) & (t == 0)

    @pl.when(first)
    def _():
        dg_ref[:, :] = dgl
        dl_ref[:, :] = dlt

    @pl.when(jnp.logical_not(first))
    def _():
        dg_ref[:, :] = dg_ref[:, :] + dgl
        dl_ref[:, :] = dl_ref[:, :] + dlt


def _pri_bwd_dirs_kernel(dirs_ref, m_ref, cot_ref,
                         consts_ref, glob_ref, lights_ref,
                         dd_ref, dd_s, *,
                         es, zs, ambient, capacity, t_near):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    m = m_ref[:, :]
    ds = cot_ref[0:1, :]
    da = [cot_ref[j + 1:j + 2, :] for j in range(9)]

    cs = consts_ref[:, :]
    gl = glob_ref[:, :]
    lt = lights_ref[:, :]

    def f(dx, dy, dz):
        logit, vals = _primary_terms(
            cs, gl, lt, dx, dy, dz,
            es=es, zs=zs, ambient=ambient, capacity=capacity, t_near=t_near,
        )
        w = jnp.exp(logit - m)
        outs = [jnp.sum(w, axis=0, keepdims=True)]
        outs += [jnp.sum(w * vals[j], axis=0, keepdims=True)
                 for j in range(9)]
        return tuple(outs)

    _, vjp_fn = jax.vjp(
        f, dirs_ref[0:1, :], dirs_ref[1:2, :], dirs_ref[2:3, :]
    )
    ddx, ddy, ddz = vjp_fn(tuple([ds] + da))

    @pl.when(c == 0)
    def _():
        dd_s[:, :] = jnp.zeros_like(dd_s[:, :])

    dd_s[0:1, :] = dd_s[0:1, :] + ddx
    dd_s[1:2, :] = dd_s[1:2, :] + ddy
    dd_s[2:3, :] = dd_s[2:3, :] + ddz

    @pl.when(c == n_chunks - 1)
    def _():
        dd_ref[:, :] = dd_s[:, :]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _primary_agg(consts, glob, lights_tab, dirs, mask,
                 es, zs, ambient, capacity, t_near, tile_p, chunk):
    """out (9, Rp): [shade rgb, ambient rgb, hit pos xyz], soft-aggregated.
    dirs: (3, Rp); consts (Tp, 32), Tp % chunk == 0, Rp % tile_p == 0.
    mask: None, or a float32 (n_tiles, n_chunks) conservative keep mask
    (soft_rt_keep_mask) — culled (tile, chunk) steps are skipped in
    forward AND backward (contributions provably <= 1e-20 relative)."""
    out, _, _ = _primary_fwd_impl(
        consts, glob, lights_tab, dirs, mask, es, zs, ambient, capacity,
        t_near, tile_p, chunk,
    )
    return out


def _primary_fwd_impl(consts, glob, lights_tab, dirs, mask, es, zs,
                      ambient, capacity, t_near, tile_p, chunk,
                      interpret=None):
    Rp = dirs.shape[1]
    Tp = consts.shape[0]
    n_chunks = Tp // chunk
    L = lights_tab.shape[0]
    interp = _interpret() if interpret is None else interpret
    out_shape = [
        jax.ShapeDtypeStruct((9, Rp), jnp.float32),
        jax.ShapeDtypeStruct((1, Rp), jnp.float32),
        jax.ShapeDtypeStruct((1, Rp), jnp.float32),
    ]
    scratch = [pltpu.VMEM((1, tile_p), jnp.float32) for _ in range(11)]
    if mask is None:
        kernel = functools.partial(
            _pri_fwd_kernel, es=es, zs=zs, ambient=ambient,
            capacity=capacity, t_near=t_near,
        )
        out, m, s = pl.pallas_call(
            kernel,
            grid=(Rp // tile_p, n_chunks),
            in_specs=[
                pl.BlockSpec((3, tile_p), lambda i, c: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, _PRI_COLS), lambda i, c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16), lambda i, c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 8), lambda i, c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((9, tile_p), lambda i, c: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_p), lambda i, c: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_p), lambda i, c: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interp,
        )(dirs, consts, glob, lights_tab)
        return out, m, s

    kernel = functools.partial(
        _pri_fwd_kernel_masked, es=es, zs=zs, ambient=ambient,
        capacity=capacity, t_near=t_near,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Rp // tile_p, n_chunks),
        in_specs=[
            pl.BlockSpec((3, tile_p), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, _PRI_COLS), lambda i, c, m_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda i, c, m_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8), lambda i, c, m_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, tile_p), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    out, m, s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
    )(mask.astype(jnp.int32).reshape(-1), dirs, consts, glob, lights_tab)
    return out, m, s


def _primary_fwd(consts, glob, lights_tab, dirs, mask,
                 es, zs, ambient, capacity, t_near, tile_p, chunk):
    out, m, s = _primary_fwd_impl(
        consts, glob, lights_tab, dirs, mask, es, zs, ambient, capacity,
        t_near, tile_p, chunk,
    )
    return out, (consts, glob, lights_tab, dirs, mask, out, m, s)


def _pri_bwd_impl(consts, glob, lights_tab, dirs, mask, m, cot,
                  es, zs, ambient, capacity, t_near, tile_p, chunk,
                  interpret=None):
    """Dispatch the primary backward from precombined cotangent rows
    cot (10, Rp) = [d s, d acc_0..8]. mask (when not None) routes
    through the chunk-culled fused kernel; the two-launch fallback
    (VMEM-bound giant tables) ignores it (correct, just slower)."""
    Rp = dirs.shape[1]
    Tp = consts.shape[0]
    n_chunks = Tp // chunk
    L = lights_tab.shape[0]

    if Tp * _PRI_COLS <= _FUSED_BWD_MAX_ROWS * 16:
        out_specs = [
            pl.BlockSpec((Tp, _PRI_COLS), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_p), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((Tp, _PRI_COLS), jnp.float32),
            jax.ShapeDtypeStruct((1, 16), jnp.float32),
            jax.ShapeDtypeStruct((L, 8), jnp.float32),
            jax.ShapeDtypeStruct((3, Rp), jnp.float32),
        ]
        interp = _interpret() if interpret is None else interpret
        if mask is None:
            tspec = lambda nrows: pl.BlockSpec(  # noqa: E731
                (nrows, tile_p), lambda i, c: (0, i),
                memory_space=pltpu.VMEM)
            dc, dg, dl, dd = pl.pallas_call(
                functools.partial(_pri_bwd_fused_kernel, es=es, zs=zs,
                                  ambient=ambient, capacity=capacity,
                                  t_near=t_near, chunk=chunk),
                grid=(Rp // tile_p, n_chunks),
                in_specs=[
                    tspec(3), tspec(1), tspec(10),
                    pl.BlockSpec((chunk, _PRI_COLS), lambda i, c: (c, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 16), lambda i, c: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((L, 8), lambda i, c: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=out_specs,
                out_shape=out_shape,
                interpret=interp,
            )(dirs, m, cot, consts, glob, lights_tab)
            return dc, dg, dl, dd

        tspec_m = lambda nrows: pl.BlockSpec(  # noqa: E731
            (nrows, tile_p), lambda i, c, m_: (0, i),
            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Rp // tile_p, n_chunks),
            in_specs=[
                tspec_m(3), tspec_m(1), tspec_m(10),
                pl.BlockSpec((chunk, _PRI_COLS), lambda i, c, m_: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16), lambda i, c, m_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 8), lambda i, c, m_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Tp, _PRI_COLS), lambda i, c, m_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16), lambda i, c, m_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 8), lambda i, c, m_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile_p), lambda i, c, m_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
        )
        dc, dg, dl, dd = pl.pallas_call(
            functools.partial(_pri_bwd_fused_kernel_masked, es=es, zs=zs,
                              ambient=ambient, capacity=capacity,
                              t_near=t_near, chunk=chunk),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interp,
        )(mask.astype(jnp.int32).reshape(-1), dirs, m, cot, consts, glob,
          lights_tab)
        return dc, dg, dl, dd

    tile_spec = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, tile_p), lambda c, i: (0, i), memory_space=pltpu.VMEM)
    dc, dg, dl = pl.pallas_call(
        functools.partial(_pri_bwd_tables_kernel, es=es, zs=zs,
                          ambient=ambient, capacity=capacity, t_near=t_near),
        grid=(n_chunks, Rp // tile_p),
        in_specs=[
            tile_spec(3), tile_spec(1), tile_spec(10),
            pl.BlockSpec((chunk, _PRI_COLS), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, _PRI_COLS), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, _PRI_COLS), jnp.float32),
            jax.ShapeDtypeStruct((1, 16), jnp.float32),
            jax.ShapeDtypeStruct((L, 8), jnp.float32),
        ],
        interpret=(_interpret() if interpret is None
                   else interpret),
    )(dirs, m, cot, consts, glob, lights_tab)

    tile_spec2 = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, tile_p), lambda i, c: (0, i), memory_space=pltpu.VMEM)
    dd = pl.pallas_call(
        functools.partial(_pri_bwd_dirs_kernel, es=es, zs=zs,
                          ambient=ambient, capacity=capacity, t_near=t_near),
        grid=(Rp // tile_p, n_chunks),
        in_specs=[
            tile_spec2(3), tile_spec2(1), tile_spec2(10),
            pl.BlockSpec((chunk, _PRI_COLS), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tile_p), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Rp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, tile_p), jnp.float32)],
        interpret=(_interpret() if interpret is None
                   else interpret),
    )(dirs, m, cot, consts, glob, lights_tab)
    return dc, dg, dl, dd


def _primary_cot(gcot, out, s, g_s=None):
    """Precombine [d s, d acc_0..8] from the out cotangent (and optional
    s cotangent): out = acc / s => d acc_j = g_j / s,
    d s = -(g . out) / s (+ g_s)."""
    srec = 1.0 / s
    da = gcot * srec
    ds = -jnp.sum(gcot * out, axis=0, keepdims=True) * srec
    if g_s is not None:
        ds = ds + g_s
    return jnp.concatenate([ds, da], axis=0)


def _mask_cot(mask):
    return None if mask is None else jnp.zeros_like(mask)


def _primary_bwd(es, zs, ambient, capacity, t_near, tile_p, chunk,
                 res, gcot):
    consts, glob, lights_tab, dirs, mask, out, m, s = res
    cot = _primary_cot(gcot, out, s)
    dc, dg, dl, dd = _pri_bwd_impl(
        consts, glob, lights_tab, dirs, mask, m, cot,
        es, zs, ambient, capacity, t_near, tile_p, chunk)
    return dc, dg, dl, dd, _mask_cot(mask)


_primary_agg.defvjp(_primary_fwd, _primary_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _primary_agg_stats(consts, glob, lights_tab, dirs, mask,
                       es, zs, ambient, capacity, t_near, tile_p,
                       chunk, interpret=None):
    """Like _primary_agg but also returns the softmax residuals (m, s)
    so a sharded caller can combine per-triangle-shard partials
    (true sum S_i = s_i * exp(m_i), numerator A_ij = out_ij * S_i).
    The m cotangent is treated as ZERO in the backward — exact PROVIDED
    downstream uses (m, s) only through s * exp(m - stop_grad(M)) terms
    (see soft_raster_pallas._soft_agg_stats)."""
    return _primary_fwd_impl(
        consts, glob, lights_tab, dirs, mask, es, zs, ambient, capacity,
        t_near, tile_p, chunk, interpret=interpret,
    )


def _primary_stats_fwd(consts, glob, lights_tab, dirs, mask,
                       es, zs, ambient, capacity, t_near, tile_p,
                       chunk, interpret=None):
    out, m, s = _primary_fwd_impl(
        consts, glob, lights_tab, dirs, mask, es, zs, ambient, capacity,
        t_near, tile_p, chunk, interpret=interpret,
    )
    return (out, m, s), (consts, glob, lights_tab, dirs, mask, out, m, s)


def _primary_stats_bwd(es, zs, ambient, capacity, t_near, tile_p,
                       chunk, interpret, res, gcots):
    consts, glob, lights_tab, dirs, mask, out, m, s = res
    g_out, _g_m, g_s = gcots  # g_m discarded (see _primary_agg_stats)
    cot = _primary_cot(g_out, out, s, g_s=g_s)
    dc, dg, dl, dd = _pri_bwd_impl(
        consts, glob, lights_tab, dirs, mask, m, cot,
        es, zs, ambient, capacity, t_near, tile_p,
        chunk, interpret=interpret)
    return dc, dg, dl, dd, _mask_cot(mask)


_primary_agg_stats.defvjp(_primary_stats_fwd, _primary_stats_bwd)


# ---------------------------------------------------------------------------
# Shadow kernel
# ---------------------------------------------------------------------------

def _shadow_od_terms(cs, sr, wx, wy, wz, *, es, zs):
    """Optical-depth sum over the chunk's triangles for one source.
    cs: (C, 16); sr: (1, 8) source row; wx/wy/wz: (1, P) world points.
    Mirrors render.soft._soft_shadow_factor's body."""

    def col(j):
        return cs[:, j:j + 1]

    def s(j):
        return sr[:, j:j + 1]

    d = [wx - s(0), wy - s(1), wz - s(2)]
    r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    lit = r2 > 0.0
    r2s = jnp.where(lit, r2, 1.0)
    rrec = jax.lax.rsqrt(r2s)
    r = r2s * rrec  # = sqrt(r2s) to fp rounding
    dh = [dj * rrec for dj in d]

    # Per-triangle source-dependent terms: b = src - v0 ((C, 1) each).
    b = [s(j) - col(j) for j in range(3)]
    e1 = [col(3), col(4), col(5)]
    e2 = [col(6), col(7), col(8)]
    n = [col(9), col(10), col(11)]
    c2b = [e2[1] * b[2] - e2[2] * b[1],
           e2[2] * b[0] - e2[0] * b[2],
           e2[0] * b[1] - e2[1] * b[0]]
    cb1 = [b[1] * e1[2] - b[2] * e1[1],
           b[2] * e1[0] - b[0] * e1[2],
           b[0] * e1[1] - b[1] * e1[0]]
    k0 = s(0) * n[0] + s(1) * n[1] + s(2) * n[2] - col(12)

    denom = -(dh[0] * n[0] + dh[1] * n[1] + dh[2] * n[2])
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    rec = 1.0 / safe
    t = k0 * rec
    u = (dh[0] * c2b[0] + dh[1] * c2b[1] + dh[2] * c2b[2]) * rec
    v = (dh[0] * cb1[0] + dh[1] * cb1[1] + dh[2] * cb1[2]) * rec
    margin = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
    cov = jax.nn.sigmoid(es * margin) * col(13)
    # t_occ gate: a miss / behind-source / near-parallel (clamp-artifact)
    # hit contributes occ = 0 (render.soft._DENOM_EPS; dh is unit so the
    # threshold is relative to |n| alone).
    nmag = jnp.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
    ok = (t > 1e-6) & (jnp.abs(denom) > 1e-3 * nmag)
    occ_z = jnp.where(
        ok, jax.nn.sigmoid(zs * (0.99 * r - t)), 0.0
    )
    # Optical depth (render.soft._soft_shadow_factor): a plain SUM —
    # chunk- and shard-associative; T = exp(-_OD_SCALE * od) per ray.
    return jnp.sum(cov * occ_z, axis=0, keepdims=True)


def _shw_fwd_kernel(world_ref, src_ref, consts_ref, trans_ref, log_s, *,
                    es, zs):
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        log_s[:, :] = jnp.zeros_like(log_s[:, :])

    log_s[:, :] = log_s[:, :] + _shadow_od_terms(
        consts_ref[:, :], src_ref[:, :],
        world_ref[0:1, :], world_ref[1:2, :], world_ref[2:3, :],
        es=es, zs=zs,
    )

    @pl.when(c == n_chunks - 1)
    def _():
        trans_ref[:, :] = jnp.exp(-_OD_SCALE * log_s[:, :])


def _shw_fwd_kernel_masked(mask_ref, world_ref, src_ref, consts_ref,
                           trans_ref, log_s, *, es, zs):
    """Chunk-culled _shw_fwd_kernel. mask_ref: flattened
    (n_tiles, S, n_chunks) int32 keep mask (soft_rt_shadow_mask) —
    index (i * S + s) * n_chunks + c for grid (s, i, c)."""
    s_ = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    S = pl.num_programs(0)
    n_chunks = pl.num_programs(2)
    keep = mask_ref[(i * S + s_) * n_chunks + c] != 0

    @pl.when(c == 0)
    def _():
        log_s[:, :] = jnp.zeros_like(log_s[:, :])

    @pl.when(keep)
    def _():
        log_s[:, :] = log_s[:, :] + _shadow_od_terms(
            consts_ref[:, :], src_ref[:, :],
            world_ref[0:1, :], world_ref[1:2, :], world_ref[2:3, :],
            es=es, zs=zs,
        )

    @pl.when(c == n_chunks - 1)
    def _():
        trans_ref[:, :] = jnp.exp(-_OD_SCALE * log_s[:, :])


def _shw_bwd_fused_kernel(world_ref, src_ref, trans_ref, gcot_ref,
                          consts_ref, dc_ref, dsrc_ref, dw_ref, *,
                          es, zs, chunk):
    """Single-launch shadow backward: one recompute + one jax.vjp per
    (source, tile, chunk) step yields ALL input cotangents (the two-launch
    split recomputed the chunk terms twice). Grid (S, n_tiles, n_chunks),
    chunk fastest:

      dc    (Tp, 16) whole-array VMEM-resident output (block index fixed
            at (0, 0) so it is never flushed mid-grid); each step
            accumulates its chunk's rows at a dynamic sublane offset
            (chunk-aligned, so 8-sublane alignment holds).
      dsrc  (1, 8) block per source, accumulated over (tile, chunk).
      dw    (3, tile_p) block per (source, tile), accumulated over the
            consecutive chunk steps, summed over sources OUTSIDE (same
            (S*3, Rp) partial layout as the two-launch version).
    """
    s_ = pl.program_id(0)
    t = pl.program_id(1)
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    # d od = gcot * dT/d od = gcot * (-_OD_SCALE) * T.
    dlog = gcot_ref[:, :] * trans_ref[:, :] * (-_OD_SCALE)

    def f(cs, sr, wx, wy, wz):
        return _shadow_od_terms(cs, sr, wx, wy, wz, es=es, zs=zs)

    _, vjp_fn = jax.vjp(
        f, consts_ref[:, :], src_ref[:, :],
        world_ref[0:1, :], world_ref[1:2, :], world_ref[2:3, :],
    )
    dcs, dsr, dwx, dwy, dwz = vjp_fn(dlog)

    first = (s_ == 0) & (t == 0) & (c == 0)

    @pl.when(first)
    def _():
        dc_ref[:, :] = jnp.zeros_like(dc_ref[:, :])

    rows = pl.ds(c * chunk, chunk)
    dc_ref[rows, :] = dc_ref[rows, :] + dcs

    @pl.when((t == 0) & (c == 0))
    def _():
        dsrc_ref[:, :] = jnp.zeros_like(dsrc_ref[:, :])

    dsrc_ref[:, :] = dsrc_ref[:, :] + dsr

    @pl.when(c == 0)
    def _():
        dw_ref[:, :] = jnp.zeros_like(dw_ref[:, :])

    dw_ref[0:1, :] = dw_ref[0:1, :] + dwx
    dw_ref[1:2, :] = dw_ref[1:2, :] + dwy
    dw_ref[2:3, :] = dw_ref[2:3, :] + dwz


def _shw_bwd_fused_kernel_masked(mask_ref, world_ref, src_ref, trans_ref,
                                 gcot_ref, consts_ref,
                                 dc_ref, dsrc_ref, dw_ref, *,
                                 es, zs, chunk):
    """Chunk-culled _shw_bwd_fused_kernel: outputs zero-init
    unconditionally, recompute + vjp + accumulate under pl.when(keep)."""
    s_ = pl.program_id(0)
    t = pl.program_id(1)
    c = pl.program_id(2)
    S = pl.num_programs(0)
    n_chunks = pl.num_programs(2)
    keep = mask_ref[(t * S + s_) * n_chunks + c] != 0

    first = (s_ == 0) & (t == 0) & (c == 0)

    @pl.when(first)
    def _():
        dc_ref[:, :] = jnp.zeros_like(dc_ref[:, :])

    @pl.when((t == 0) & (c == 0))
    def _():
        dsrc_ref[:, :] = jnp.zeros_like(dsrc_ref[:, :])

    @pl.when(c == 0)
    def _():
        dw_ref[:, :] = jnp.zeros_like(dw_ref[:, :])

    @pl.when(keep)
    def _():
        dlog = gcot_ref[:, :] * trans_ref[:, :] * (-_OD_SCALE)

        def f(cs, sr, wx, wy, wz):
            return _shadow_od_terms(cs, sr, wx, wy, wz, es=es, zs=zs)

        _, vjp_fn = jax.vjp(
            f, consts_ref[:, :], src_ref[:, :],
            world_ref[0:1, :], world_ref[1:2, :], world_ref[2:3, :],
        )
        dcs, dsr, dwx, dwy, dwz = vjp_fn(dlog)

        rows = pl.ds(c * chunk, chunk)
        dc_ref[rows, :] = dc_ref[rows, :] + dcs
        dsrc_ref[:, :] = dsrc_ref[:, :] + dsr
        dw_ref[0:1, :] = dw_ref[0:1, :] + dwx
        dw_ref[1:2, :] = dw_ref[1:2, :] + dwy
        dw_ref[2:3, :] = dw_ref[2:3, :] + dwz


def _shw_bwd_consts_kernel(world_ref, src_ref, trans_ref, gcot_ref,
                           consts_ref, dc_ref, *, es, zs):
    c = pl.program_id(0)
    s_ = pl.program_id(1)
    t = pl.program_id(2)
    # d od = gcot * dT/d od = gcot * (-_OD_SCALE) * T.
    dlog = gcot_ref[:, :] * trans_ref[:, :] * (-_OD_SCALE)
    wx, wy, wz = (world_ref[0:1, :], world_ref[1:2, :], world_ref[2:3, :])
    sr = src_ref[:, :]

    def f(cs):
        return _shadow_od_terms(cs, sr, wx, wy, wz, es=es, zs=zs)

    _, vjp_fn = jax.vjp(f, consts_ref[:, :])
    (dcs,) = vjp_fn(dlog)
    first = (s_ == 0) & (t == 0)

    @pl.when(first)
    def _():
        dc_ref[:, :] = dcs

    @pl.when(jnp.logical_not(first))
    def _():
        dc_ref[:, :] = dc_ref[:, :] + dcs


def _shw_bwd_rays_kernel(world_ref, src_ref, trans_ref, gcot_ref,
                         consts_ref, dsrc_ref, dw_ref, dw_s, dsrc_s, *,
                         es, zs):
    t = pl.program_id(1)
    c = pl.program_id(2)
    n_tiles = pl.num_programs(1)
    n_chunks = pl.num_programs(2)
    # d od = gcot * dT/d od = gcot * (-_OD_SCALE) * T.
    dlog = gcot_ref[:, :] * trans_ref[:, :] * (-_OD_SCALE)
    cs = consts_ref[:, :]

    def f(sr, wx, wy, wz):
        return _shadow_od_terms(cs, sr, wx, wy, wz, es=es, zs=zs)

    _, vjp_fn = jax.vjp(
        f, src_ref[:, :], world_ref[0:1, :], world_ref[1:2, :],
        world_ref[2:3, :],
    )
    dsr, dwx, dwy, dwz = vjp_fn(dlog)

    first_for_src = (t == 0) & (c == 0)

    @pl.when(first_for_src)
    def _():
        dsrc_s[:, :] = jnp.zeros_like(dsrc_s[:, :])

    dsrc_s[:, :] = dsrc_s[:, :] + dsr

    @pl.when((t == n_tiles - 1) & (c == n_chunks - 1))
    def _():
        dsrc_ref[:, :] = dsrc_s[:, :]

    @pl.when(c == 0)
    def _():
        dw_s[:, :] = jnp.zeros_like(dw_s[:, :])

    dw_s[0:1, :] = dw_s[0:1, :] + dwx
    dw_s[1:2, :] = dw_s[1:2, :] + dwy
    dw_s[2:3, :] = dw_s[2:3, :] + dwz

    @pl.when(c == n_chunks - 1)
    def _():
        dw_ref[:, :] = dw_s[:, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _shadow_trans(consts, srcs, world, mask, es, zs, tile_p, chunk,
                  interpret=None):
    """(S, Rp) smooth transmittance from each source to each world point.
    srcs: (S, 8) rows [position xyz, pad]; world: (3, Rp). mask: None or
    a float32 (n_tiles, S, n_chunks) keep mask (soft_rt_shadow_mask)."""
    return _shadow_fwd_impl(consts, srcs, world, mask, es, zs, tile_p,
                            chunk, interpret=interpret)


def _shadow_fwd_impl(consts, srcs, world, mask, es, zs, tile_p, chunk,
                     interpret=None):
    Rp = world.shape[1]
    Tp = consts.shape[0]
    n_chunks = Tp // chunk
    S = srcs.shape[0]
    interp = _interpret() if interpret is None else interpret
    out_shape = jax.ShapeDtypeStruct((S, Rp), jnp.float32)
    scratch = [pltpu.VMEM((1, tile_p), jnp.float32)]
    if mask is None:
        trans = pl.pallas_call(
            functools.partial(_shw_fwd_kernel, es=es, zs=zs),
            grid=(S, Rp // tile_p, n_chunks),
            in_specs=[
                pl.BlockSpec((3, tile_p), lambda s, i, c: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8), lambda s, i, c: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, _SHW_COLS), lambda s, i, c: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_p), lambda s, i, c: (s, i),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interp,
        )(world, srcs, consts)
        return trans

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, Rp // tile_p, n_chunks),
        in_specs=[
            pl.BlockSpec((3, tile_p), lambda s, i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda s, i, c, m_: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, _SHW_COLS), lambda s, i, c, m_: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_p), lambda s, i, c, m_: (s, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    trans = pl.pallas_call(
        functools.partial(_shw_fwd_kernel_masked, es=es, zs=zs),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
    )(mask.astype(jnp.int32).reshape(-1), world, srcs, consts)
    return trans


def _shadow_fwd(consts, srcs, world, mask, es, zs, tile_p, chunk,
                interpret=None):
    trans = _shadow_fwd_impl(consts, srcs, world, mask, es, zs, tile_p,
                             chunk, interpret=interpret)
    return trans, (consts, srcs, world, mask, trans)


def _shadow_bwd(es, zs, tile_p, chunk, interpret, res, gcot):
    consts, srcs, world, mask, trans = res
    Rp = world.shape[1]
    Tp = consts.shape[0]
    n_chunks = Tp // chunk
    S = srcs.shape[0]
    n_tiles = Rp // tile_p

    if Tp <= _FUSED_BWD_MAX_ROWS:
        out_shape = [
            jax.ShapeDtypeStruct((Tp, _SHW_COLS), jnp.float32),
            jax.ShapeDtypeStruct((S, 8), jnp.float32),
            jax.ShapeDtypeStruct((S * 3, Rp), jnp.float32),
        ]
        interp = _interpret() if interpret is None else interpret
        if mask is None:
            dc, dsrc, dw_part = pl.pallas_call(
                functools.partial(_shw_bwd_fused_kernel, es=es, zs=zs,
                                  chunk=chunk),
                grid=(S, n_tiles, n_chunks),
                in_specs=[
                    pl.BlockSpec((3, tile_p), lambda s, i, c: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8), lambda s, i, c: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile_p), lambda s, i, c: (s, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile_p), lambda s, i, c: (s, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, _SHW_COLS),
                                 lambda s, i, c: (c, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((Tp, _SHW_COLS), lambda s, i, c: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8), lambda s, i, c: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, tile_p), lambda s, i, c: (s, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=out_shape,
                interpret=interp,
            )(world, srcs, trans, gcot, consts)
            dw = jnp.sum(dw_part.reshape(S, 3, Rp), axis=0)
            return dc, dsrc, dw, _mask_cot(mask)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S, n_tiles, n_chunks),
            in_specs=[
                pl.BlockSpec((3, tile_p), lambda s, i, c, m_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8), lambda s, i, c, m_: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_p), lambda s, i, c, m_: (s, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_p), lambda s, i, c, m_: (s, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, _SHW_COLS),
                             lambda s, i, c, m_: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Tp, _SHW_COLS), lambda s, i, c, m_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8), lambda s, i, c, m_: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile_p), lambda s, i, c, m_: (s, i),
                             memory_space=pltpu.VMEM),
            ],
        )
        dc, dsrc, dw_part = pl.pallas_call(
            functools.partial(_shw_bwd_fused_kernel_masked, es=es, zs=zs,
                              chunk=chunk),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interp,
        )(mask.astype(jnp.int32).reshape(-1), world, srcs, trans, gcot,
          consts)
        dw = jnp.sum(dw_part.reshape(S, 3, Rp), axis=0)
        return dc, dsrc, dw, _mask_cot(mask)

    dc = pl.pallas_call(
        functools.partial(_shw_bwd_consts_kernel, es=es, zs=zs),
        grid=(n_chunks, S, n_tiles),
        in_specs=[
            pl.BlockSpec((3, tile_p), lambda c, s, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda c, s, i: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda c, s, i: (s, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda c, s, i: (s, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, _SHW_COLS), lambda c, s, i: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, _SHW_COLS), lambda c, s, i: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, _SHW_COLS), jnp.float32),
        interpret=(_interpret() if interpret is None
                   else interpret),
    )(world, srcs, trans, gcot, consts)

    dsrc, dw_part = pl.pallas_call(
        functools.partial(_shw_bwd_rays_kernel, es=es, zs=zs),
        grid=(S, n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((3, tile_p), lambda s, i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda s, i, c: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda s, i, c: (s, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda s, i, c: (s, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, _SHW_COLS), lambda s, i, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8), lambda s, i, c: (s, 0),
                         memory_space=pltpu.VMEM),
            # (S*3, Rp) partial d_world; block row index s covers rows
            # [3s, 3s+3) (index maps are in block units).
            pl.BlockSpec((3, tile_p), lambda s, i, c: (s, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, 8), jnp.float32),
            jax.ShapeDtypeStruct((S * 3, Rp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, tile_p), jnp.float32),
            pltpu.VMEM((1, 8), jnp.float32),
        ],
        interpret=(_interpret() if interpret is None
                   else interpret),
    )(world, srcs, trans, gcot, consts)
    dw = jnp.sum(dw_part.reshape(S, 3, Rp), axis=0)
    return dc, dsrc, dw, _mask_cot(mask)


_shadow_trans.defvjp(_shadow_fwd, _shadow_bwd)


# ---------------------------------------------------------------------------
# Chunk culling (sound under the round-5 bounded-background logit)
# ---------------------------------------------------------------------------

# ln(1e-20): a culled contribution is bounded to exp(-46) RELATIVE to
# the background hypothesis (logit 0) that floors every ray's softmax
# denominator — the same magnitude the kernel's own active-mask epsilon
# already treats as zero. Matches soft_raster_pallas._CULL_MARGIN.
_CULL_MARGIN = 46.0

# Margin <-> distance conversion: for a plane point P at in-plane
# distance D from a triangle with maximum edge length E, the barycentric
# margin min(u, v, 1-u-v) is <= -D / (2 E). (Edge regions: the active
# barycentric is -D/h with height h <= E. Vertex regions at angle theta:
# the normal-cone direction splits phi_b + phi_c = pi - theta, so one of
# cos(phi)/h_{B,C} >= sin(theta/2) / (min(b,c) sin(theta)) =
# 1/(2 min(b,c) cos(theta/2)) >= 1/(2 E).) Ray-to-triangle 3D distance
# lower-bounds the plane point's in-plane distance, so a ray that misses
# a chunk's bounding sphere by delta has es * margin <= -es * delta/(2E)
# against every triangle in it. The near-parallel gate (_DENOM_EPS)
# makes the kernel's computed margin trustworthy wherever it is not
# exactly zeroed.
_MARGIN_PER_DIST = 0.5  # |margin| >= dist / (2 E)


def _chunk_cull_bounds(v0, v1, v2, chunk):
    """Per-chunk bounding sphere + max edge length over COVERAGE-CARRYING
    rows: a row contributes weight iff its plane normal is nonzero (the
    kernels' near-parallel gate zeroes degenerate rows exactly), and
    inactive-but-nondegenerate rows still carry e^-46-relative coverage,
    so the bound covers them too (cf. soft_raster_pallas
    .soft_chunk_bounds). Returns (centers, radii, emax); radius -1 marks
    an all-degenerate chunk (always culled)."""
    from raytpu.kernels.cull import chunk_spheres

    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    used = (jnp.sum(n * n, axis=-1) > 0.0).astype(jnp.float32)
    centers, radii = chunk_spheres(v0, v1, v2, used, chunk)

    elen2 = jnp.maximum(
        jnp.maximum(jnp.sum(e1 * e1, axis=-1), jnp.sum(e2 * e2, axis=-1)),
        jnp.sum((v2 - v1) ** 2, axis=-1),
    )
    T = elen2.shape[0]
    Tp = -(-T // chunk) * chunk
    if Tp != T:
        elen2 = jnp.concatenate(
            [elen2, jnp.zeros((Tp - T,), jnp.float32)])
        used = jnp.concatenate([used, jnp.zeros((Tp - T,), jnp.float32)])
    elen2 = jnp.where(used > 0.0, elen2, 0.0)
    emax = jnp.sqrt(jnp.max(elen2.reshape(-1, chunk), axis=1))
    return centers, radii, emax


def _inflate(radii, delta):
    """Inflate chunk radii, keeping empty chunks (-1) permanently culled."""
    return jnp.where(radii >= 0.0, radii + delta, -1.0)


def soft_rt_keep_mask(dirs, origin, v0, v1, v2,
                      es: float, zs: float, t_near: float,
                      tile_p: int, chunk: int) -> jax.Array:
    """Conservative (n_tiles, n_chunks) float32 keep mask for the soft
    PRIMARY kernel under the round-5 bounded logit
    zs * zinv + log_sigmoid(es * margin) with the SIMPLEX-CLAMPED depth
    (zinv = 1/max(|clamped point - o|, t_near)) and background at 0.

    The clamped point lies inside the triangle, hence inside the chunk's
    bounding sphere, so a chunk's depth term is bounded by
    zs / max(d_c - r_c, t_near); its coverage term for a ray that
    misses the sphere by delta is <= -es * delta / (2 E)
    (_MARGIN_PER_DIST). A chunk may therefore be dropped for a tile
    when every tile ray clears the sphere inflated by
    delta_c = 2 E (46 + zs / max(d_c - r_c, t_near)) / es — tested with
    kernels.cull.keep_mask (fully conservative incl. half-line and
    inside-sphere cases). Dropped (tile, chunk) pairs contribute
    <= e^-46 x the background weight, forward and backward.
    dirs: (Rp, 3) swizzled tile order (replicate-padded); origin: (3,).
    """
    from raytpu.kernels.cull import keep_mask, tile_cones

    centers, radii, emax = _chunk_cull_bounds(v0, v1, v2, chunk)
    d_c = jnp.linalg.norm(centers - origin[None, :], axis=-1)
    zinv_max = 1.0 / jnp.maximum(d_c - jnp.maximum(radii, 0.0), t_near)
    # 1.05 relative + small absolute slack on the f32 threshold algebra
    # (the cone test carries its own propagated error budget).
    delta = (2.0 * emax / es) * (_CULL_MARGIN + zs * zinv_max) * 1.05 \
        + 1e-3
    axes, cos_half = tile_cones(dirs, tile_p)
    keep = keep_mask(origin, axes, cos_half, centers,
                     _inflate(radii, delta)).astype(bool)
    keep = keep & (radii >= 0.0)[None, :]
    return keep.astype(jnp.float32)


def soft_rt_shadow_mask(world, src_pos, v0, v1, v2,
                        es: float, zs: float,
                        tile_p: int, chunk: int) -> jax.Array:
    """Conservative (n_tiles, S, n_chunks) float32 keep mask for the soft
    SHADOW kernel: occ = sigmoid(es * margin) * sigmoid(zs(0.99 r - t))
    needs no depth bound (occ <= 1), so a chunk whose triangles all sit
    >= 2E * 46/es from every shadow ray segment contributes od <= e^-46
    per pair (~1e-16 total at 9k triangles against T = exp(-16 od)).
    Reuses the hard path's hull{source, tile-position-sphere} cone test
    with the chunk radii inflated by that margin and the range cap
    extended by 46/zs (the sigmoid window past the surface point).
    world: (Rp, 3) aggregated hit positions in swizzled tile order
    (stop-gradient; the mask is piecewise-constant)."""
    from raytpu.kernels.cull import position_shadow_mask

    centers, radii, emax = _chunk_cull_bounds(v0, v1, v2, chunk)
    delta = (2.0 * emax / es) * _CULL_MARGIN * 1.05 + 1e-3
    return position_shadow_mask(
        world, src_pos, centers, _inflate(radii, delta), tile_p,
        range_pad=_CULL_MARGIN / zs * 1.05 + 1e-3,
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Public wrapper
# ---------------------------------------------------------------------------

def raytrace_soft_pallas(scene, camera, lights, cfg,
                         tile_p: int = 1024, chunk: int = 32,
                         cull: bool | None = None) -> jax.Array:
    """Fused-kernel raytrace_soft. Returns (H, W, 3); matches
    render.soft.raytrace_soft to fp-reassociation tolerance with
    end-to-end gradients (scene, camera, lights).

    cull=None (auto) enables the conservative chunk cull
    (soft_rt_keep_mask / soft_rt_shadow_mask — sound since the round-5
    bounded-background logit) on multi-chunk scenes when the image tiles
    evenly into 2D pixel blocks; the pixel swizzle is a pure
    reshape/transpose of the pixel grid and output rows."""
    from raytpu.kernels.intersect_pallas import _swizzle, _unswizzle
    from raytpu.kernels.soft_raster_pallas import _cull_block, lights_table
    from raytpu.render.raytrace import camera_ray_dirs, pixel_grid
    from raytpu.render.soft import _T_NEAR

    H, W = cfg.height, cfg.width
    T = scene.num_triangles
    chunk = min(chunk, max(T, 8))
    # T == 0 still launches one all-invalid chunk (see soft_raster_pallas:
    # a zero-length grid dim never writes the outputs).
    padt = chunk if T == 0 else (-T) % chunk
    n_chunks = (T + padt) // chunk

    blk = _cull_block(tile_p, H, W)
    use_cull = (cull if cull is not None
                else (n_chunks > 1 and blk is not None))
    if use_cull and blk is None:
        raise ValueError(
            f"cull=True needs H, W to tile into 2D blocks for tile_p "
            f"{tile_p}; got {H}x{W}"
        )

    xs, ys = pixel_grid(cfg)
    if use_cull:
        th, tw = blk
        xs = _swizzle(xs, H, W, th, tw)
        ys = _swizzle(ys, H, W, th, tw)
    dirs = camera_ray_dirs(xs, ys, camera, cfg)  # (R, 3)
    R = dirs.shape[0]
    es = float(cfg.soft_edge_sharpness)
    zs = float(cfg.soft_z_sharpness)
    t_near = float(_T_NEAR)

    pri = primary_tri_constants(scene, camera.pos)
    shw = shadow_tri_constants(scene)
    if padt:
        pri = jnp.concatenate(
            [pri, jnp.zeros((padt, _PRI_COLS), jnp.float32)], axis=0)
        shw = jnp.concatenate(
            [shw, jnp.zeros((padt, _SHW_COLS), jnp.float32)], axis=0)

    glob = jnp.concatenate(
        [camera.pos, jnp.zeros((13,), jnp.float32)])[None, :]
    lt = lights_table(lights)

    dirs_t = dirs.T  # (3, R)
    padr = (-R) % tile_p
    if padr:
        # Replicate a real ray (junk pad directions would blow the cull
        # cones wide open); padded outputs are sliced off below.
        dirs_t = jnp.concatenate(
            [dirs_t, jnp.broadcast_to(dirs_t[:, -1:], (3, padr))], axis=1)

    pmask = None
    if use_cull:
        pmask = soft_rt_keep_mask(
            jax.lax.stop_gradient(dirs_t.T),
            jax.lax.stop_gradient(camera.pos),
            jax.lax.stop_gradient(scene.v0),
            jax.lax.stop_gradient(scene.v1),
            jax.lax.stop_gradient(scene.v2),
            es, zs, t_near, tile_p, chunk)

    out = _primary_agg(
        pri, glob, lt, dirs_t, pmask,
        es, zs, float(cfg.ambient), lights.capacity, t_near, tile_p,
        chunk,
    )
    alb = out[0:3]
    world = out[3:6]
    nrm = out[6:9]

    # Shadow sources: per light, the jittered sample positions when
    # soft-shadowing (`raytracer.cpp:272-296`), else the light position.
    samples = max(cfg.soft_shadow_samples, 1)
    if samples > 1:
        src_pos = lights.jitter[:, :samples].reshape(-1, 3)
    else:
        src_pos = lights.position
    S = src_pos.shape[0]
    srcs = jnp.concatenate(
        [src_pos, jnp.zeros((S, 5), jnp.float32)], axis=1)

    smask = None
    if use_cull:
        smask = soft_rt_shadow_mask(
            jax.lax.stop_gradient(world.T),
            jax.lax.stop_gradient(src_pos),
            jax.lax.stop_gradient(scene.v0),
            jax.lax.stop_gradient(scene.v1),
            jax.lax.stop_gradient(scene.v2),
            es, zs, tile_p, chunk)

    trans = _shadow_trans(
        shw, srcs, world, smask, es, zs, tile_p, chunk,
    )  # (S, Rp)
    per_light = jnp.mean(trans.reshape(lights.capacity, samples, -1),
                         axis=1)
    denom = jnp.maximum(jnp.sum(lights.mask), 1.0)
    shadow = jnp.sum(lights.mask[:, None] * per_light, axis=0) / denom

    from raytpu.render.soft import shade_agg_raytrace

    final = shade_agg_raytrace(alb.T, world.T, nrm.T, lights,
                               float(cfg.ambient), shadow)
    final = final[:R]
    if use_cull:
        final = _unswizzle(final, H, W, blk[0], blk[1])
    return final.reshape(H, W, 3)
