"""Fused soft-rasterizer Pallas kernel with a custom VJP.

The differentiable rasterizer (raytpu.render.soft.rasterize_soft — the
soft z-buffer relaxation of `rasteriser.cpp:606`'s z-test over the
cleared-to-0 depth buffer `rasteriser.cpp:188`) is the project's thesis,
but its jnp formulation materializes per-(pixel, triangle-chunk) fields in
HBM each scan step, and the backward pass re-reads every residual —
~16 ms fwd+bwd at 512^2 on one v5e chip. This kernel keeps the whole
online-softmax aggregation in VMEM:

  forward   grid (pixel_tile, tri_chunk), chunk fastest; running
            (m, s, acc[10]) carry in VMEM scratch; per step the chunk's
            depth logits, compact-support coverages and attribute
            channels (albedo, pos3d numerator, zinv, normal — round-4
            relaxation, render.soft module docstring) are computed
            in-register from a per-triangle constants table. Outputs
            agg (10, R) plus the (m, s) softmax residuals; per-pixel
            shading happens on the aggregate OUTSIDE the kernel.

  backward  grid (tri_chunk, pixel_tile), tile fastest; recomputes the
            chunk terms at the saved (m, s) and applies jax.vjp of the
            chunk-contribution function in-kernel. d(consts) accumulates
            across pixel tiles into a per-chunk output block; d(lights)
            and d(globals) accumulate across the whole grid. The softmax
            shift m is a saved residual treated as constant — exactly
            right, since img = acc/s is invariant to m (numerator and
            denominator both carry exp(-m)), so dL/dm == 0 analytically.

Differentiation boundary: the custom_vjp wraps tables, not pytrees — the
(T, 32) triangle constants, (1, 16) camera globals and (L, 8) light table
are built in jnp from Scene/Camera/Lights, so autodiff chains end-to-end
(vertex positions, camera pose, light parameters all receive gradients).

Numerics match raytpu.render.soft.rasterize_soft to ~1e-5 rel (the edge
functions are evaluated from precomputed plane coefficients instead of
vertex differences, and quotients by a shared divisor use one reciprocal
per CLAUDE.md's VPU-divide rule — algebraically identical, fp-reassociated).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CONST_COLS = 32

# Number of aggregated channels: [albedo rgb, pos3d-numerator xyz, zinv,
# normal xyz] (render.soft round-4 relaxation).
_N_CH = 10



def soft_tri_constants(sx, sy, zinv, pos3d, color, normal, keep):
    """Per-triangle constants table for the soft kernel.

    sx, sy, zinv: (T, 3) float screen verts + vertex 1/z;
    pos3d: (T, 3, 3) camera-space pos/z per vertex; color/normal: (T, 3);
    keep: (T,). Returns (T, 32) float32 rows:

      0-5   vertex screen coords ax ay bx by cx cy
      6-8   edge scale factors s_k = orient / (|edge_k| + 1e-12)
      9     1 / area_safe (signed; barycentric normalization)
      10-12 vertex zinv
      13-21 pos3d row-major (v0 xyz, v1 xyz, v2 xyz)
      22-24 albedo rgb
      25-27 normal xyz
      28    valid = keep * (|area| > 1e-4)
      29-31 zero padding

    Edge values and barycentrics are evaluated IN-KERNEL from the vertex
    coordinates (differences first, products after) — evaluating
    precomputed affine planes A px + B py + C instead loses ~3 digits to
    f32 cancellation at 500-px coordinate magnitudes, which showed up as
    ~1% vertex-gradient error vs the jnp path. Conventions match
    render.soft._fields_for (orientation sign, 1e-12 norm slack, 1e-4
    px^2 degenerate-area cutoff).
    """
    ax, ay = sx[:, 0], sy[:, 0]
    bx, by = sx[:, 1], sy[:, 1]
    cx, cy = sx[:, 2], sy[:, 2]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    area_ok = jnp.abs(area) > 1e-4
    area_safe = jnp.where(jnp.abs(area) > 1e-12, area, 1e-12)
    orient = jnp.sign(area_safe)

    def edge_scale(x0, y0, x1, y1):
        ex = x1 - x0
        ey = y1 - y0
        # Guard sqrt(0) for degenerate (padded) edges — the edge value is
        # identically 0 there, but sqrt'(0) = inf NaNs vertex/camera
        # grads (CLAUDE.md grad-safety invariant; same guard as
        # render.soft._fields_for).
        n2 = ex * ex + ey * ey
        return orient / (jnp.sqrt(jnp.where(n2 > 0.0, n2, 1.0)) + 1e-12)

    s0 = edge_scale(ax, ay, bx, by)
    s1 = edge_scale(bx, by, cx, cy)
    s2 = edge_scale(cx, cy, ax, ay)

    valid = keep * area_ok.astype(jnp.float32)
    cols = [
        ax, ay, bx, by, cx, cy,
        s0, s1, s2,
        1.0 / area_safe,
        zinv[:, 0], zinv[:, 1], zinv[:, 2],
        pos3d[:, 0, 0], pos3d[:, 0, 1], pos3d[:, 0, 2],
        pos3d[:, 1, 0], pos3d[:, 1, 1], pos3d[:, 1, 2],
        pos3d[:, 2, 0], pos3d[:, 2, 1], pos3d[:, 2, 2],
        color[:, 0], color[:, 1], color[:, 2],
        normal[:, 0], normal[:, 1], normal[:, 2],
        valid,
    ]
    zeros = jnp.zeros_like(ax)
    cols += [zeros] * (_CONST_COLS - len(cols))
    return jnp.stack(cols, axis=1)


def camera_globals(camera, cfg) -> jax.Array:
    """(1, 16) row: inv_rot row-major (9), camera pos (3), zero pad."""
    from raytpu.ops.raster import glm_inverse3

    inv_rot = glm_inverse3(camera.rotation())
    return jnp.concatenate(
        [inv_rot.reshape(-1), camera.pos, jnp.zeros((4,), jnp.float32)]
    )[None, :]


def lights_table(lights) -> jax.Array:
    """(L, 8) rows: position (3), color (3), intensity, mask."""
    return jnp.concatenate(
        [
            lights.position,
            lights.color,
            lights.intensity[:, None],
            lights.mask[:, None],
        ],
        axis=1,
    )


def _chunk_terms(cs, gl, lt, px, py, *, es, zs, ambient, capacity):
    """Per-(triangle, pixel) logit and attribute channels for one chunk.

    cs: (C, 32) constants; gl: (1, 16) globals; lt: (L, 8) lights
    (unused since round 4 — shading happens on the aggregate outside the
    kernel; kept for table-shape compatibility); px, py: (1, P).
    Returns (logit, vals[10]) — each (C, P); vals = [albedo rgb,
    pos3d-numerator xyz, zinv, normal xyz].

    Pure jnp on 2D values: runs identically inside the Pallas kernel
    (on loaded blocks) and in plain XLA (tests), and is jax.vjp-able
    in-kernel for the backward pass. Mirrors render.soft._fields_for
    term-for-term up to documented fp reassociations (ADVICE r3 item 2):
    edge values from precomputed per-triangle scale factors; raw edge
    values reused as barycentric numerators; min-of-squares-then-sqrt
    for the segment distance — each ~1e-5-rel vs the jnp forms.
    """

    def col(j):
        return cs[:, j:j + 1]  # (C, 1)

    def g(j):
        return gl[:, j:j + 1]  # (1, 1)

    ax, ay = col(0), col(1)
    bx, by = col(2), col(3)
    cx, cy = col(4), col(5)

    def edge_raw(x0, y0, x1, y1):
        # Differences first, products after — see soft_tri_constants's
        # layout note on f32 cancellation.
        return (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)

    # Raw edge values double as barycentric numerators: the 2D identity
    # cross(v1 - v0, p - v0) == cross(v1 - p, v2(-cycle) - p) means
    # edge_raw(b, c) IS l0's numerator and edge_raw(c, a) IS l1's
    # (same difference-first conditioning; saves ~14 VPU slots/pair).
    r0 = edge_raw(ax, ay, bx, by)
    r1 = edge_raw(bx, by, cx, cy)
    r2 = edge_raw(cx, cy, ax, ay)
    e0 = r0 * col(6)
    e1 = r1 * col(7)
    e2 = r2 * col(8)
    hp_min = jnp.minimum(jnp.minimum(e0, e1), e2)

    def seg2(x0, y0, x1, y1):
        # Squared distance to the edge SEGMENT (outside pixels; the
        # half-plane min is only a distance inside the triangle).
        ex = x1 - x0
        ey = y1 - y0
        rec = 1.0 / (ex * ex + ey * ey + 1e-12)
        tpar = jnp.clip(
            ((px - x0) * ex + (py - y0) * ey) * rec, 0.0, 1.0
        )
        dx = px - (x0 + tpar * ex)
        dy = py - (y0 + tpar * ey)
        return dx * dx + dy * dy + 1e-20

    # sqrt(min of squares) == min of sqrts (monotone): ONE sqrt per pair
    # instead of three, bit-identical result.
    seg_min = jnp.sqrt(jnp.minimum(
        jnp.minimum(seg2(ax, ay, bx, by), seg2(bx, by, cx, cy)),
        seg2(cx, cy, ax, ay),
    ))
    sdist = jnp.where(hp_min >= 0.0, hp_min, -seg_min)

    inv_area = col(9)
    l0 = r1 * inv_area
    l1 = r2 * inv_area
    l2 = 1.0 - l0 - l1
    l0c = jnp.clip(l0, 0.0, 1.0)
    l1c = jnp.clip(l1, 0.0, 1.0)
    l2c = jnp.clip(l2, 0.0, 1.0)
    lrec = 1.0 / (l0c + l1c + l2c + 1e-12)
    l0c = l0c * lrec
    l1c = l1c * lrec
    l2c = l2c * lrec

    zpx = l0c * col(10) + l1c * col(11) + l2c * col(12)
    # Round-4 relaxation (render.soft module docstring): hypotheses
    # aggregate ATTRIBUTES — albedo, the pos3d-numerator (pre-division:
    # zrec moves to the per-pixel epilogue), zinv and the normal;
    # shading happens once per pixel outside the kernel.
    logit = (
        zs * zpx
        + jax.nn.log_sigmoid(es * sdist)
        + jnp.log(col(28) + 1e-20)
    )
    pnum = [
        l0c * col(13 + j) + l1c * col(16 + j) + l2c * col(19 + j)
        for j in range(3)
    ]
    vals = [jnp.broadcast_to(col(22 + j), logit.shape) for j in range(3)]
    vals += pnum
    vals += [zpx]
    vals += [jnp.broadcast_to(col(25 + j), logit.shape) for j in range(3)]
    return logit, vals


def _fwd_kernel(px_ref, consts_ref, glob_ref, lights_ref,
                img_ref, m_ref, s_ref,
                m_s, s_s, *acc_s,
                es, zs, ambient, capacity):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    px = px_ref[0:1, :]
    py = px_ref[1:2, :]

    @pl.when(c == 0)
    def _():
        # Background hypothesis: logit 0 at zinv = 0, zero attributes
        # (`rasteriser.cpp:188` cleared depth buffer).
        m_s[:, :] = jnp.zeros_like(m_s[:, :])
        s_s[:, :] = jnp.ones_like(s_s[:, :])
        for a in acc_s:
            a[:, :] = jnp.zeros_like(a[:, :])

    logit, vals = _chunk_terms(
        consts_ref[:, :], glob_ref[:, :], lights_ref[:, :], px, py,
        es=es, zs=zs, ambient=ambient, capacity=capacity,
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
            img_ref[j:j + 1, :] = a[:, :] * rec
        m_ref[:, :] = m_s[:, :]
        s_ref[:, :] = s_s[:, :]


def _bwd_kernel(px_ref, m_ref, cot_ref,
                consts_ref, glob_ref, lights_ref,
                dc_ref, dg_ref, dl_ref, *,
                es, zs, ambient, capacity):
    c = pl.program_id(0)
    t = pl.program_id(1)
    px = px_ref[0:1, :]
    py = px_ref[1:2, :]
    m = m_ref[:, :]

    # Cotangent rows [d s, d acc_0..9] are precombined OUTSIDE the kernel
    # (tiny (11, R) elementwise jnp) — keeps the kernel agnostic to
    # whether the caller differentiates img alone (_soft_agg) or
    # (img, m, s) (_soft_agg_stats, sharded-combine path).
    ds = cot_ref[0:1, :]
    da = [cot_ref[j + 1:j + 2, :] for j in range(_N_CH)]

    def f(cs, gl, lt):
        logit, vals = _chunk_terms(
            cs, gl, lt, px, py,
            es=es, zs=zs, ambient=ambient, capacity=capacity,
        )
        # m is the saved global row max — constant here (dL/dm == 0
        # analytically; see module docstring).
        w = jnp.exp(logit - m)
        outs = [jnp.sum(w, axis=0, keepdims=True)]
        outs += [jnp.sum(w * vals[j], axis=0, keepdims=True)
                 for j in range(_N_CH)]
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


def _fwd_kernel_masked(mask_ref, px_ref, consts_ref, glob_ref, lights_ref,
                       img_ref, m_ref, s_ref,
                       m_s, s_s, *acc_s,
                       es, zs, ambient, capacity):
    """Chunk-culled _fwd_kernel: the per-chunk math runs under
    pl.when(keep); carries, init and the final normalize stay
    unconditional. mask_ref: (n_tiles * n_chunks,) int32 scalar-prefetch
    keep mask (soft_keep_mask)."""
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
        px = px_ref[0:1, :]
        py = px_ref[1:2, :]
        logit, vals = _chunk_terms(
            consts_ref[:, :], glob_ref[:, :], lights_ref[:, :], px, py,
            es=es, zs=zs, ambient=ambient, capacity=capacity,
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
            img_ref[j:j + 1, :] = a[:, :] * rec
        m_ref[:, :] = m_s[:, :]
        s_ref[:, :] = s_s[:, :]


def _bwd_kernel_masked(mask_ref, px_ref, m_ref, cot_ref,
                       consts_ref, glob_ref, lights_ref,
                       dc_ref, dg_ref, dl_ref, *,
                       es, zs, ambient, capacity):
    """Chunk-culled _bwd_kernel: outputs are zero-initialized
    unconditionally on first visit, then accumulated under
    pl.when(keep). A culled (tile, chunk) pair's true gradient carries
    the same <= 1e-20 relative weight the forward dropped
    (soft_keep_mask)."""
    c = pl.program_id(0)
    t = pl.program_id(1)
    n_chunks = pl.num_programs(0)
    keep = mask_ref[t * n_chunks + c] != 0

    @pl.when(t == 0)
    def _():
        dc_ref[:, :] = jnp.zeros_like(dc_ref[:, :])

    @pl.when((c == 0) & (t == 0))
    def _():
        dg_ref[:, :] = jnp.zeros_like(dg_ref[:, :])
        dl_ref[:, :] = jnp.zeros_like(dl_ref[:, :])

    @pl.when(keep)
    def _():
        px = px_ref[0:1, :]
        py = px_ref[1:2, :]
        m = m_ref[:, :]
        ds = cot_ref[0:1, :]
        da = [cot_ref[j + 1:j + 2, :] for j in range(_N_CH)]

        def f(cs, gl, lt):
            logit, vals = _chunk_terms(
                cs, gl, lt, px, py,
                es=es, zs=zs, ambient=ambient, capacity=capacity,
            )
            w = jnp.exp(logit - m)
            outs = [jnp.sum(w, axis=0, keepdims=True)]
            outs += [jnp.sum(w * vals[j], axis=0, keepdims=True)
                     for j in range(_N_CH)]
            return tuple(outs)

        _, vjp_fn = jax.vjp(
            f, consts_ref[:, :], glob_ref[:, :], lights_ref[:, :]
        )
        dcs, dgl, dlt = vjp_fn(tuple([ds] + da))
        dc_ref[:, :] = dc_ref[:, :] + dcs
        dg_ref[:, :] = dg_ref[:, :] + dgl
        dl_ref[:, :] = dl_ref[:, :] + dlt


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Chunk culling (soft analog of kernels/cull.py — screen-space boxes)
# ---------------------------------------------------------------------------

# ln(1e-20): the kernel's own validity epsilon. A culled contribution is
# bounded to exp(-_CULL_MARGIN) RELATIVE to the background hypothesis
# (logit 0), i.e. the same magnitude the kernel already treats as zero.
_CULL_MARGIN = 46.0


def soft_chunk_bounds(consts: jax.Array, chunk: int):
    """Per-chunk screen bbox + max vertex zinv for the cull test.

    consts: (Tp, 32) soft_tri_constants rows, Tp % chunk == 0. Rows that
    are entirely zero (chunk padding) are excluded; every OTHER row —
    including valid == 0 (degenerate-area) ones — is covered, because the
    kernel still evaluates it with a finite logit (zs * zpx - 46) that
    the cull bound must dominate.

    Returns (boxes (n_chunks, 4) [xmin, ymin, xmax, ymax],
             zmax (n_chunks,) max vertex zinv clamped at 0,
             nonempty (n_chunks,) bool).
    """
    Tp = consts.shape[0]
    n = Tp // chunk
    c = consts.reshape(n, chunk, _CONST_COLS)
    row_used = jnp.any(c != 0.0, axis=-1)                 # (n, chunk)
    xs = jnp.stack([c[..., 0], c[..., 2], c[..., 4]], -1)  # (n, chunk, 3)
    ys = jnp.stack([c[..., 1], c[..., 3], c[..., 5]], -1)
    zi = jnp.stack([c[..., 10], c[..., 11], c[..., 12]], -1)
    big = jnp.float32(3.0e38)
    m3 = row_used[..., None]
    xmin = jnp.min(jnp.where(m3, xs, big), axis=(1, 2))
    xmax = jnp.max(jnp.where(m3, xs, -big), axis=(1, 2))
    ymin = jnp.min(jnp.where(m3, ys, big), axis=(1, 2))
    ymax = jnp.max(jnp.where(m3, ys, -big), axis=(1, 2))
    zmax = jnp.maximum(jnp.max(jnp.where(m3, zi, -big), axis=(1, 2)), 0.0)
    nonempty = jnp.any(row_used, axis=1)
    boxes = jnp.stack([xmin, ymin, xmax, ymax], axis=1)
    return boxes, zmax, nonempty


def soft_keep_mask(coords: jax.Array, consts: jax.Array,
                   es: float, zs: float, tile_p: int,
                   chunk: int) -> jax.Array:
    """Conservative (n_tiles, n_chunks) float32 keep-mask for the soft
    raster kernels.

    A chunk may be skipped for a pixel tile when every pixel of the tile
    is farther than delta_c from the chunk's screen bbox, with
    delta_c = (zs * zmax_c + _CULL_MARGIN) / es: a dropped row's logit is
    then <= zs * zpx + log_sigmoid(es * sdist) <= zs * zmax_c
    - es * delta_c = -_CULL_MARGIN, i.e. weight <= 1e-20 x the background
    hypothesis that floors every pixel's softmax denominator
    (log_sigmoid(-x) <= -x; sdist <= -boxdist since the triangle lies in
    its bbox). Gradients of dropped terms carry the same exp factor, so
    the mask is cull-safe for the backward too. Pixel-tile boxes come
    from the ACTUAL coords (swizzled 2D blocks make them tight; -1e9
    padding columns blow a tile's box wide open, which only over-keeps).
    """
    Rp = coords.shape[1]
    n_tiles = Rp // tile_p
    px = coords[0].reshape(n_tiles, tile_p)
    py = coords[1].reshape(n_tiles, tile_p)
    tbox = jnp.stack([px.min(1), py.min(1), px.max(1), py.max(1)], axis=1)

    boxes, zmax, nonempty = soft_chunk_bounds(consts, chunk)
    delta = (zs * zmax + _CULL_MARGIN) / es               # (n_chunks,)

    def axis_gap(tlo, thi, clo, chi):
        return jnp.maximum(
            jnp.maximum(clo[None, :] - thi[:, None],
                        tlo[:, None] - chi[None, :]), 0.0)

    dx = axis_gap(tbox[:, 0], tbox[:, 2], boxes[:, 0], boxes[:, 2])
    dy = axis_gap(tbox[:, 1], tbox[:, 3], boxes[:, 1], boxes[:, 3])
    # Relative + absolute slack on the comparison (f32 boxes at ~1e3 px).
    lim = delta[None, :] * 1.001 + 0.5
    keep = (dx * dx + dy * dy <= lim * lim) & nonempty[None, :]
    return keep.astype(jnp.float32)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _soft_agg(consts, glob, lights_tab, coords, mask,
              es, zs, ambient, capacity, tile_p, chunk, interpret=None):
    """agg (_N_CH, Rp) = soft-z attribute aggregation
    ([albedo rgb, pos3d-numerator xyz, zinv, normal xyz]; shading happens
    on the aggregate outside). coords: (2, Rp) pixel x, y;
    consts (Tp, 32) with Tp % chunk == 0, Rp % tile_p == 0.
    mask: None, or a float32 (n_tiles, n_chunks) conservative keep mask
    (soft_keep_mask) — culled (tile, chunk) steps are skipped in forward
    AND backward (contributions provably <= 1e-20 relative)."""
    img, _, _ = _soft_agg_fwd_impl(
        consts, glob, lights_tab, coords, mask, es, zs, ambient, capacity,
        tile_p, chunk, interpret=interpret,
    )
    return img


def _soft_agg_fwd_impl(consts, glob, lights_tab, coords, mask,
                       es, zs, ambient, capacity, tile_p, chunk,
                       interpret=None):
    Rp = coords.shape[1]
    Tp = consts.shape[0]
    n_chunks = Tp // chunk
    L = lights_tab.shape[0]
    interp = _interpret() if interpret is None else interpret
    out_shape = [
        jax.ShapeDtypeStruct((_N_CH, Rp), jnp.float32),
        jax.ShapeDtypeStruct((1, Rp), jnp.float32),
        jax.ShapeDtypeStruct((1, Rp), jnp.float32),
    ]
    scratch = [pltpu.VMEM((1, tile_p), jnp.float32)
               for _ in range(2 + _N_CH)]
    if mask is None:
        kernel = functools.partial(
            _fwd_kernel, es=es, zs=zs, ambient=ambient, capacity=capacity,
        )
        img, m, s = pl.pallas_call(
            kernel,
            grid=(Rp // tile_p, n_chunks),
            in_specs=[
                pl.BlockSpec((2, tile_p), lambda i, c: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, _CONST_COLS), lambda i, c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16), lambda i, c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 8), lambda i, c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((_N_CH, tile_p), lambda i, c: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_p), lambda i, c: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_p), lambda i, c: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interp,
        )(coords, consts, glob, lights_tab)
        return img, m, s

    kernel = functools.partial(
        _fwd_kernel_masked, es=es, zs=zs, ambient=ambient,
        capacity=capacity,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Rp // tile_p, n_chunks),
        in_specs=[
            pl.BlockSpec((2, tile_p), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, _CONST_COLS), lambda i, c, m_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda i, c, m_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8), lambda i, c, m_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_N_CH, tile_p), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    img, m, s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
    )(mask.astype(jnp.int32).reshape(-1), coords, consts, glob,
      lights_tab)
    return img, m, s


def _soft_agg_fwd(consts, glob, lights_tab, coords, mask,
                  es, zs, ambient, capacity, tile_p, chunk,
                  interpret=None):
    img, m, s = _soft_agg_fwd_impl(
        consts, glob, lights_tab, coords, mask, es, zs, ambient, capacity,
        tile_p, chunk, interpret=interpret,
    )
    return img, (consts, glob, lights_tab, coords, mask, img, m, s)


def _bwd_impl(consts, glob, lights_tab, coords, mask, m, cot,
              es, zs, ambient, capacity, tile_p, chunk, interpret=None):
    Rp = coords.shape[1]
    Tp = consts.shape[0]
    n_chunks = Tp // chunk
    n_tiles = Rp // tile_p
    L = lights_tab.shape[0]
    interp = _interpret() if interpret is None else interpret
    out_shape = [
        jax.ShapeDtypeStruct((Tp, _CONST_COLS), jnp.float32),
        jax.ShapeDtypeStruct((1, 16), jnp.float32),
        jax.ShapeDtypeStruct((L, 8), jnp.float32),
    ]
    if mask is None:
        kernel = functools.partial(
            _bwd_kernel, es=es, zs=zs, ambient=ambient, capacity=capacity,
        )
        dc, dg, dl = pl.pallas_call(
            kernel,
            grid=(n_chunks, n_tiles),
            in_specs=[
                pl.BlockSpec((2, tile_p), lambda c, i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_p), lambda c, i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1 + _N_CH, tile_p), lambda c, i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, _CONST_COLS), lambda c, i: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16), lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 8), lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((chunk, _CONST_COLS), lambda c, i: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16), lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 8), lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            interpret=interp,
        )(coords, m, cot, consts, glob, lights_tab)
        return dc, dg, dl

    kernel = functools.partial(
        _bwd_kernel_masked, es=es, zs=zs, ambient=ambient,
        capacity=capacity,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks, n_tiles),
        in_specs=[
            pl.BlockSpec((2, tile_p), lambda c, i, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda c, i, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1 + _N_CH, tile_p), lambda c, i, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, _CONST_COLS), lambda c, i, m_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda c, i, m_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8), lambda c, i, m_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, _CONST_COLS), lambda c, i, m_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda c, i, m_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8), lambda c, i, m_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dc, dg, dl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
    )(mask.astype(jnp.int32).reshape(-1), coords, m, cot, consts, glob,
      lights_tab)
    return dc, dg, dl


def _mask_cot(mask):
    return None if mask is None else jnp.zeros_like(mask)


def _soft_agg_bwd(es, zs, ambient, capacity, tile_p, chunk, interpret,
                  res, gcot):
    consts, glob, lights_tab, coords, mask, img, m, s = res
    # img = acc / s  =>  d acc_j = g_j / s;  d s = -(g . img) / s.
    srec = 1.0 / s
    da = gcot * srec
    ds = -jnp.sum(gcot * img, axis=0, keepdims=True) * srec
    cot = jnp.concatenate([ds, da], axis=0)
    dc, dg, dl = _bwd_impl(consts, glob, lights_tab, coords, mask, m, cot,
                           es, zs, ambient, capacity, tile_p, chunk,
                           interpret=interpret)
    return dc, dg, dl, jnp.zeros_like(coords), _mask_cot(mask)


_soft_agg.defvjp(_soft_agg_fwd, _soft_agg_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _soft_agg_stats(consts, glob, lights_tab, coords, mask,
                    es, zs, ambient, capacity, tile_p, chunk,
                    interpret=None):
    """Like _soft_agg but also returns the softmax residuals (m, s) so a
    sharded caller can combine per-triangle-shard partial aggregations
    (parallel/render.py::soft-mode blocks): true sum S_i = s_i * exp(m_i),
    numerator A_ij = img_ij * S_i. The backward treats the m cotangent as
    ZERO — exact, PROVIDED downstream uses (m, s) only through
    s * exp(m - stop_grad(M)) terms: the kernel's ds (computed with m
    held constant) then carries exactly the terms the discarded m-path
    would have contributed (they cancel analytically, module docstring)."""
    return _soft_agg_fwd_impl(
        consts, glob, lights_tab, coords, mask, es, zs, ambient, capacity,
        tile_p, chunk, interpret=interpret,
    )


def _soft_agg_stats_fwd(consts, glob, lights_tab, coords, mask,
                        es, zs, ambient, capacity, tile_p, chunk,
                        interpret=None):
    img, m, s = _soft_agg_fwd_impl(
        consts, glob, lights_tab, coords, mask, es, zs, ambient, capacity,
        tile_p, chunk, interpret=interpret,
    )
    return (img, m, s), (consts, glob, lights_tab, coords, mask, img, m, s)


def _soft_agg_stats_bwd(es, zs, ambient, capacity, tile_p, chunk,
                        interpret, res, gcots):
    consts, glob, lights_tab, coords, mask, img, m, s = res
    g_img, _g_m, g_s = gcots  # g_m discarded (see _soft_agg_stats)
    srec = 1.0 / s
    da = g_img * srec
    ds = -jnp.sum(g_img * img, axis=0, keepdims=True) * srec + g_s
    cot = jnp.concatenate([ds, da], axis=0)
    dc, dg, dl = _bwd_impl(consts, glob, lights_tab, coords, mask, m, cot,
                           es, zs, ambient, capacity, tile_p, chunk,
                           interpret=interpret)
    return dc, dg, dl, jnp.zeros_like(coords), _mask_cot(mask)


_soft_agg_stats.defvjp(_soft_agg_stats_fwd, _soft_agg_stats_bwd)


def _cull_block(tile_p: int, H: int, W: int):
    """(th, tw) pixel-block shape for culling, or None when the image
    cannot be evenly blocked. Spatially square-ish 2D blocks make tile
    bboxes tight (a row-major tile spans the whole image width and keeps
    nearly everything — CLAUDE.md round-1 lesson)."""
    tw = 32
    while tw > 1 and (tile_p % tw or W % tw):
        tw //= 2
    th = tile_p // tw
    if tile_p % tw or H % th or W % tw:
        return None
    return th, tw


def rasterize_soft_pallas(scene, camera, lights, cfg,
                          tile_p: int = 1024, chunk: int = 32,
                          cull: bool | None = None) -> jax.Array:
    """Fused-kernel rasterize_soft. Returns (H, W, 3); gradients flow to
    scene vertices/colors, camera pose and light parameters through the
    custom VJP (see module docstring).

    cull=None (auto) enables conservative chunk culling (soft_keep_mask)
    on multi-chunk scenes when the image tiles evenly into 2D pixel
    blocks; the pixel swizzle is a pure reshape/transpose on the coords
    and the output columns (the kernel is order-agnostic in pixels).
    """
    from raytpu.kernels.intersect_pallas import _swizzle, _unswizzle
    from raytpu.render.soft import _screen_vertices

    H, W = cfg.height, cfg.width
    sx, sy, zinv, pos3d = _screen_vertices(scene, camera, cfg)
    consts = soft_tri_constants(
        sx, sy, zinv, pos3d, scene.color, scene.normals(), scene.active
    )
    glob = camera_globals(camera, cfg)
    lt = lights_table(lights)

    T = consts.shape[0]
    chunk = min(chunk, max(T, 8))
    # T == 0 must still launch one (all-invalid) chunk: a zero-length grid
    # dimension never writes the output buffers, returning garbage where
    # the jnp path correctly returns the background hypothesis.
    padt = chunk if T == 0 else (-T) % chunk
    if padt:
        consts = jnp.concatenate(
            [consts, jnp.zeros((padt, _CONST_COLS), jnp.float32)], axis=0
        )
    n_chunks = consts.shape[0] // chunk

    blk = _cull_block(tile_p, H, W)
    use_cull = (cull if cull is not None
                else (n_chunks > 1 and blk is not None))
    if use_cull and blk is None:
        raise ValueError(
            f"cull=True needs H, W to tile into 2D blocks for tile_p "
            f"{tile_p}; got {H}x{W}"
        )

    R = H * W
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    xs, ys = xs.reshape(-1), ys.reshape(-1)
    if use_cull:
        th, tw = blk
        xs = _swizzle(xs, H, W, th, tw)
        ys = _swizzle(ys, H, W, th, tw)
    coords = jnp.stack([xs, ys], axis=0)
    padr = (-R) % tile_p
    if padr:
        coords = jnp.concatenate(
            [coords, jnp.full((2, padr), -1e9, jnp.float32)], axis=1
        )

    es = float(cfg.soft_edge_sharpness)
    zs = float(cfg.soft_z_sharpness)
    mask = None
    if use_cull:
        mask = soft_keep_mask(
            jax.lax.stop_gradient(coords),
            jax.lax.stop_gradient(consts), es, zs, tile_p, chunk)

    agg = _soft_agg(
        consts, glob, lt, coords, mask,
        es, zs, float(cfg.ambient), lights.capacity, tile_p, chunk,
    )
    agg = agg[:, :R].T  # (R, _N_CH)
    if use_cull:
        agg = _unswizzle(agg, H, W, blk[0], blk[1])

    from raytpu.render.soft import shade_agg_raster

    img = shade_agg_raster(agg[:, 0:3], agg[:, 3:6], agg[:, 6],
                           agg[:, 7:10], camera, lights,
                           float(cfg.ambient))
    return img.reshape(H, W, 3)
