"""Fused tile-based rasterizer Pallas kernel (exact hard path).

Accelerates rasterize_exact (raytpu.render.soft): the jnp path
materializes (R, T) signed-distance/zinv fields in HBM. Here each pixel
tile resolves its winning triangle on-chip:

  grid (pixel_tile, tri_chunk), chunk fastest; per step:
    pipeline <- pixel coords (2, TILE_P) + chunk plane constants (C, 16)
    E_k(p) = A_k px + B_k py + C_k   (3 normalized edges)   -> VPU
    sdist = min_k E_k;  covered = sdist >= 0
    zpx   = Za px + Zb py + Zc      (zinv is affine in screen space)
    masked argmax-zinv carry in VMEM scratch (first-wins ties =
    the reference's strict > z-test, `rasteriser.cpp:606`)
  outputs: winner index per pixel (int32; -1 = background).

Only the winner INDEX leaves the kernel: attributes (zinv, pos3d) are
recomputed outside for the winner alone, which keeps the op trivially
differentiable (the index is piecewise-constant; everything smooth flows
through the jnp recompute).

Per-triangle constants are precomputed in jnp (screen verts -> normalized
edge coefficients + zinv plane), stored chunk-blocked (C, 16) with the
narrow minor dim confined to one pipelined block (see
intersect_pallas.py's layout notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -3.4028235e38


def _kernel(px_ref, consts_ref, idx_ref, best_z_ref, best_idx_ref, *,
            tri_chunk: int):
    """One (pixel tile, triangle chunk) grid step.

    px_ref:     (2, TILE_P) VMEM — pixel x, y (float).
    consts_ref: (C, 16) VMEM — per triangle rows
                [A0 B0 C0 A1 B1 C1 A2 B2 C2 Za Zb Zc valid 0 0 0].
    idx_ref:    (1, TILE_P) int32 output (written on last chunk step).
    best_z_ref, best_idx_ref: (1, TILE_P) VMEM scratch.
    """
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    px = px_ref[0:1, :]  # (1, TILE_P)
    py = px_ref[1:2, :]

    @pl.when(c == 0)
    def _():
        best_z_ref[:, :] = jnp.full_like(best_z_ref[:, :], _NEG_INF)
        best_idx_ref[:, :] = jnp.full_like(best_idx_ref[:, :], -1)

    def col(j):
        return consts_ref[:, j : j + 1]  # (C, 1)

    e0 = col(0) * px + col(1) * py + col(2)  # (C, TILE_P)
    e1 = col(3) * px + col(4) * py + col(5)
    e2 = col(6) * px + col(7) * py + col(8)
    sdist = jnp.minimum(jnp.minimum(e0, e1), e2)
    zpx = col(9) * px + col(10) * py + col(11)
    covered = (sdist >= 0.0) & (zpx > 0.0) & (col(12) > 0.0)
    z = jnp.where(covered, zpx, _NEG_INF)

    chunk_max = jnp.max(z, axis=0, keepdims=True)  # (1, TILE_P)
    rows = jax.lax.broadcasted_iota(jnp.int32, z.shape, dimension=0)
    # First triangle wins ties (strict > z-test, `rasteriser.cpp:606`).
    big = jnp.int32(2147483647)
    chunk_idx = jnp.min(
        jnp.where(z == chunk_max, rows, big), axis=0, keepdims=True
    ) + c * tri_chunk

    best_z = best_z_ref[:, :]
    upd = chunk_max > best_z  # strictly greater: earlier chunk keeps ties
    best_z = jnp.where(upd, chunk_max, best_z)
    best_idx = jnp.where(upd, chunk_idx, best_idx_ref[:, :])
    best_z_ref[:, :] = best_z
    best_idx_ref[:, :] = best_idx

    @pl.when(c == n_chunks - 1)
    def _():
        idx_ref[:, :] = jnp.where(best_z > _NEG_INF, best_idx, -1)


def _kernel_blk8(consts_s, px_ref, idx_ref, *, C: int):
    """Single-chunk winner resolve at (8, P8) vreg density (round 5 —
    same re-blocking as kernels/render_fused._fwd_kernel_blk8: per-ray
    rows on (1, tile) occupy one sublane of each vreg and run the merge
    chains at 1/8 density; measured 2x on the winner sweep).

    consts_s: flattened (C, 16) rows via scalar prefetch (Mosaic rejects
    (1,1)->(8,P8) broadcasts; scalar * vector is native), with INVALID
    rows pre-folded (edge constant c0 = -3e38 makes coverage
    impossible — bit-identical winners to the valid-flag test).
    px_ref: (16, P8) rows [px x8 | py x8]; idx_ref: (8, P8) int32.
    Tie-break: strict > update keeps the FIRST covering triangle
    (`rasteriser.cpp:606`), matching _kernel's min-iota-at-max.
    """
    px = px_ref[0:8, :]
    py = px_ref[8:16, :]
    best_z = jnp.full(px.shape, _NEG_INF, jnp.float32)
    best_i = jnp.full(px.shape, -1, jnp.int32)
    for i in range(C):
        def g(j, i=i):
            return consts_s[16 * i + j]

        e0 = g(0) * px + g(1) * py + g(2)
        e1 = g(3) * px + g(4) * py + g(5)
        e2 = g(6) * px + g(7) * py + g(8)
        sdist = jnp.minimum(jnp.minimum(e0, e1), e2)
        zpx = g(9) * px + g(10) * py + g(11)
        covered = (sdist >= 0.0) & (zpx > 0.0)
        z = jnp.where(covered, zpx, _NEG_INF)
        upd = z > best_z
        best_z = jnp.where(upd, z, best_z)
        best_i = jnp.where(upd, i, best_i)
    idx_ref[:, :] = jnp.where(best_z > _NEG_INF, best_i, -1)


def raster_tri_constants(sx, sy, zinv, keep):
    """Per-triangle plane constants for the kernel.

    sx, sy, zinv: (T, 3) float screen verts + vertex 1/z. keep: (T,).
    Returns (T, 16) float32 rows
    [A0 B0 C0 A1 B1 C1 A2 B2 C2 Za Zb Zc valid pad pad pad], where the
    edge coefficients are normalized (|(A,B)| = 1) and oriented
    inside-positive, and (Za, Zb, Zc) is the screen-space affine zinv
    plane (zinv is linear in screen coordinates).
    """
    ax, ay = sx[:, 0], sy[:, 0]
    bx, by = sx[:, 1], sy[:, 1]
    cx, cy = sx[:, 2], sy[:, 2]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    # px^2 threshold: near-degenerate screen triangles (edge-on faces)
    # otherwise produce sdist ~ 0 bands along whole lines.
    area_ok = jnp.abs(area) > 1e-4
    area_safe = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    orient = jnp.sign(area_safe)

    def edge(x0, y0, x1, y1):
        # E(p) = (x1-x0)(py-y0) - (y1-y0)(px-x0) =: A px + B py + C
        ex = x1 - x0
        ey = y1 - y0
        norm = jnp.sqrt(ex * ex + ey * ey) + 1e-12
        a = -ey * orient / norm
        b = ex * orient / norm
        cc = (ey * x0 - ex * y0) * orient / norm
        return a, b, cc

    a0, b0, c0 = edge(ax, ay, bx, by)
    a1, b1, c1 = edge(bx, by, cx, cy)
    a2, b2, c2 = edge(cx, cy, ax, ay)

    # zinv plane: solve the affine fit through the three vertices.
    z0, z1, z2 = zinv[:, 0], zinv[:, 1], zinv[:, 2]
    za = (
        (z1 - z0) * (cy - ay) - (z2 - z0) * (by - ay)
    ) / area_safe
    zb = (
        (z2 - z0) * (bx - ax) - (z1 - z0) * (cx - ax)
    ) / area_safe
    zc = z0 - za * ax - zb * ay

    valid = (keep > 0.0) & area_ok
    zeros = jnp.zeros_like(ax)
    return jnp.stack(
        [a0, b0, c0, a1, b1, c1, a2, b2, c2, za, zb, zc,
         valid.astype(jnp.float32), zeros, zeros, zeros],
        axis=1,
    )


def _kernel_masked(mask_ref, px_ref, consts_ref, idx_ref, best_z_ref,
                   best_idx_ref, *, tri_chunk: int):
    """Chunk-culled _kernel (identical math — bit-identical winners).

    mask_ref: (n_tiles * n_chunks,) int32 scalar-prefetch keep mask from
    screen-space chunk AABBs vs pixel-tile rects (chunk_screen_mask).
    """
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    px = px_ref[0:1, :]
    py = px_ref[1:2, :]

    @pl.when(c == 0)
    def _():
        best_z_ref[:, :] = jnp.full_like(best_z_ref[:, :], _NEG_INF)
        best_idx_ref[:, :] = jnp.full_like(best_idx_ref[:, :], -1)

    @pl.when(mask_ref[i * n_chunks + c] != 0)
    def _chunk():
        def col(j):
            return consts_ref[:, j : j + 1]  # (C, 1)

        e0 = col(0) * px + col(1) * py + col(2)
        e1 = col(3) * px + col(4) * py + col(5)
        e2 = col(6) * px + col(7) * py + col(8)
        sdist = jnp.minimum(jnp.minimum(e0, e1), e2)
        zpx = col(9) * px + col(10) * py + col(11)
        covered = (sdist >= 0.0) & (zpx > 0.0) & (col(12) > 0.0)
        z = jnp.where(covered, zpx, _NEG_INF)

        chunk_max = jnp.max(z, axis=0, keepdims=True)
        rows = jax.lax.broadcasted_iota(jnp.int32, z.shape, dimension=0)
        # First triangle wins ties (strict > z-test, `rasteriser.cpp:606`).
        big = jnp.int32(2147483647)
        chunk_idx = jnp.min(
            jnp.where(z == chunk_max, rows, big), axis=0, keepdims=True
        ) + c * tri_chunk

        best_z = best_z_ref[:, :]
        upd = chunk_max > best_z
        best_z_ref[:, :] = jnp.where(upd, chunk_max, best_z)
        best_idx_ref[:, :] = jnp.where(upd, chunk_idx, best_idx_ref[:, :])

    @pl.when(c == n_chunks - 1)
    def _():
        best_z = best_z_ref[:, :]
        idx_ref[:, :] = jnp.where(best_z > _NEG_INF, best_idx_ref[:, :], -1)


def chunk_screen_mask(sx, sy, zinv, valid, px, py, tile_p: int,
                      chunk: int) -> jax.Array:
    """Conservative (n_tiles, n_chunks) keep mask for the raster kernel.

    A covered pixel lies inside its triangle's convex hull, hence inside
    the triangle's screen AABB — so a pixel tile whose rect misses the
    union AABB of a chunk's valid triangles can skip the chunk. Triangles
    with any vertex at zinv <= 0 (behind the camera — their projections
    are unusable, exactly as in the unculled kernel) inflate their chunk
    to always-keep.

    sx, sy, zinv: (T, 3) screen verts + vertex 1/z; valid: (T,);
    px, py: (R,) pixel coords (already tile-ordered), R % tile_p == 0.
    """
    T = sx.shape[0]
    Tp = -(-T // chunk) * chunk
    pad = Tp - T

    def padv(a, fill):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        ) if pad else a

    sx_, sy_ = padv(sx, 0.0), padv(sy, 0.0)
    v = padv(valid, 0.0) > 0.0
    behind = padv(jnp.min(zinv, axis=1), 1.0) <= 0.0
    big = jnp.float32(3.0e38)
    txmin = jnp.where(v, jnp.where(behind, -big, jnp.min(sx_, axis=1)), big)
    txmax = jnp.where(v, jnp.where(behind, big, jnp.max(sx_, axis=1)), -big)
    tymin = jnp.where(v, jnp.where(behind, -big, jnp.min(sy_, axis=1)), big)
    tymax = jnp.where(v, jnp.where(behind, big, jnp.max(sy_, axis=1)), -big)
    n_chunks = Tp // chunk
    cxmin = jnp.min(txmin.reshape(n_chunks, chunk), axis=1)
    cxmax = jnp.max(txmax.reshape(n_chunks, chunk), axis=1)
    cymin = jnp.min(tymin.reshape(n_chunks, chunk), axis=1)
    cymax = jnp.max(tymax.reshape(n_chunks, chunk), axis=1)

    n_tiles = px.shape[0] // tile_p
    pxt = px.reshape(n_tiles, tile_p)
    pyt = py.reshape(n_tiles, tile_p)
    rxmin = jnp.min(pxt, axis=1)[:, None]
    rxmax = jnp.max(pxt, axis=1)[:, None]
    rymin = jnp.min(pyt, axis=1)[:, None]
    rymax = jnp.max(pyt, axis=1)[:, None]

    # Conservative slack (ADVICE round-1 item 2): the kernel's normalized
    # edge functions carry ~1e-4 px absolute rounding error that a sliver
    # triangle's sharp apex amplifies by 1/sin(half-angle) — an absolute
    # 1e-3 px margin was not provably enough. A few-pixel fixed margin
    # plus a relative term for large coordinate magnitudes costs ~nothing
    # (chunk AABBs are coarse) and dominates the amplified error for any
    # triangle that passes the kernel's area_ok floor.
    def _finite_mag(x):
        ax = jnp.abs(x)
        return jnp.max(jnp.where(ax < 1e30, ax, 0.0))  # skip +-big sentinels

    mag = jnp.maximum(
        jnp.maximum(_finite_mag(cxmin), _finite_mag(cxmax)),
        jnp.maximum(_finite_mag(cymin), _finite_mag(cymax)),
    )
    eps = 2.0 + 1e-5 * mag
    keep = (
        (cxmin[None, :] <= rxmax + eps) & (cxmax[None, :] >= rxmin - eps)
        & (cymin[None, :] <= rymax + eps) & (cymax[None, :] >= rymin - eps)
    )
    return keep.astype(jnp.int32)


def resolve_winner_pallas(px, py, consts, tile_p: int = 2048,
                          tri_chunk: int = 128,
                          screen_verts=None,
                          image_hw: tuple | None = None) -> jax.Array:
    """Winning triangle per pixel. px, py: (R,) float32 pixel coords;
    consts: (T, 16) from raster_tri_constants. Returns (R,) int32.

    screen_verts: optional (sx, sy, zinv) — (T, 3) each, the inputs of
    raster_tri_constants — enables conservative screen-space chunk
    culling (chunk_screen_mask) on multi-chunk scenes; winners stay
    bit-identical. image_hw: (H, W) when the pixels are a row-major grid,
    for spatially-tight (th, tw) pixel-block tiles.
    """
    from raytpu.kernels.intersect_pallas import (
        _swizzle,
        _tile_shape,
        _unswizzle,
    )

    R = px.shape[0]
    chunk = min(tri_chunk, 128)
    T = ((consts.shape[0] + chunk - 1) // chunk) * chunk
    if T != consts.shape[0]:
        consts = jnp.concatenate(
            [consts,
             jnp.zeros((T - consts.shape[0], 16), jnp.float32)], axis=0
        )
    n_chunks = T // chunk

    cull = screen_verts is not None and n_chunks > 1
    tiled = _tile_shape(image_hw, tile_p) if cull else None
    if tiled is not None:
        th, tw = tiled
        H, W = image_hw
        px = _swizzle(px, H, W, th, tw)
        py = _swizzle(py, H, W, th, tw)
    pad = (-R) % tile_p
    coords = jnp.stack([px, py], axis=0)  # (2, R)
    if pad:
        coords = jnp.concatenate(
            [coords, jnp.full((2, pad), -1e9, jnp.float32)], axis=1
        )
    Rp = R + pad

    if cull:
        sx, sy, zinv = screen_verts
        mask = chunk_screen_mask(sx, sy, zinv, consts[: sx.shape[0], 12],
                                 coords[0], coords[1], tile_p, chunk)
        kernel = functools.partial(_kernel_masked, tri_chunk=chunk)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Rp // tile_p, n_chunks),
            in_specs=[
                pl.BlockSpec((2, tile_p), lambda i, c, m_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 16), lambda i, c, m_: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_p), lambda i, c, m_: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, tile_p), jnp.float32),
                pltpu.VMEM((1, tile_p), jnp.int32),
            ],
        )
        idx = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            interpret=jax.default_backend() != "tpu",
        )(mask.reshape(-1), coords, consts)
        out = idx[0, :R] if tiled is None else _unswizzle(
            idx[0], image_hw[0], image_hw[1], th, tw
        )
        return out

    if n_chunks == 1 and tile_p % 8 == 0:
        # Single-chunk (Cornell-scale) fast path at (8, P8) density.
        from raytpu.kernels.render_fused import _blk8, _unblk8

        folded = consts.at[:, 2].set(-3.0e38)
        consts_f = jnp.where(consts[:, 12:13] > 0.0, consts, folded)
        p8 = tile_p // 8
        idx8 = pl.pallas_call(
            functools.partial(_kernel_blk8, C=T),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Rp // tile_p,),
                in_specs=[
                    pl.BlockSpec((16, p8), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, p8), lambda i, *_: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, Rp // 8), jnp.int32),
            interpret=jax.default_backend() != "tpu",
        )(consts_f.reshape(-1), _blk8(coords, tile_p))
        return _unblk8(idx8, tile_p)[0, :R]

    kernel = functools.partial(_kernel, tri_chunk=chunk)
    idx = pl.pallas_call(
        kernel,
        grid=(Rp // tile_p, n_chunks),
        in_specs=[
            pl.BlockSpec((2, tile_p), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 16), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_p), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Rp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, tile_p), jnp.float32),
            pltpu.VMEM((1, tile_p), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(coords, consts)
    return idx[0, :R]
