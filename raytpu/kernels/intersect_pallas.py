"""Fused closest-hit Pallas kernel.

The jnp path (raytpu.ops.intersect) materializes (R, 3T) dot products and
several (R, T) intermediates in HBM — at 512^2 x 32 triangles that is
~600 MB of traffic per pass and the measured bottleneck (bench.py). This
kernel keeps everything on-chip:

  grid (ray_tile, tri_chunk), chunk axis fastest; per step:
    pipeline <- dirs tile (3, TILE_R) + chunk constants (4C, 3)
    prods = rows (C, 3) @ dirs (3, TILE_R)        -> MXU
    t,u,v tests + masked min-reduce               -> VPU
    VMEM scratch carries (best_t, best_idx) across chunk steps;
    outputs written on the last chunk step.

Layout notes (hard-won):
  * Triangle constants must NOT be VMEM-resident as one (3T, 3) array —
    the 3-wide minor dim pads to 128 lanes, so 9k triangles need >20 MB
    (scoped-vmem OOM). Streaming one (4C, 3) chunk block per grid step
    keeps the padded footprint at ~256 KB.
  * The streaming must go through the grid pipeline, not manual DMA: HBM
    slices of a minor-dim-3 array violate the (1,128) tile alignment.
  * Lane-major constant layouts that avoid padding entirely need a
    contract-dim-0 matmul or a (1,C)->(C,1) transpose — both send the
    Mosaic compiler into multi-minute hangs.

HBM traffic drops to O(R + T) in+out. The closest-hit reduction reproduces
the reference semantics: Euclidean-equivalent t ordering with
LAST-triangle tie-break (`raytracer.cpp:243`).

The op carries a custom VJP: t* = k0_i / (-d . n_i) for the winning
triangle i, so the backward is a cheap per-ray gather + one-hot matmul —
no (R, T) replay.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.ops.intersect import Hits, TriConstants

# Python float (not a jnp scalar): jnp constants captured inside a Pallas
# kernel body become "captured constants" and are rejected.
_F32MAX = 3.4028235e38


def _chunk_tuv(m_ref, C: int, dx, dy, dz):
    """Plane tests of one constant chunk against a ray tile.

    m_ref: the (4C, 3) chunk-blocked constants (rows [n | c2 | c3 | k0]);
    dx/dy/dz: (1, TILE_R) ray direction components. Returns
    (t (C, TILE_R), ok (C, TILE_R)).

    The K=3 "matmuls" run as VPU broadcast-FMA: (C,1)x(1,TILE_R) outer
    products. The obvious jnp.dot(HIGHEST) alternative runs the f32
    six-pass MXU emulation and is ~2x slower end-to-end (the MXU is >97%
    padding at K=3); bf16 single-pass is fast but flips closest-hit
    winners near silhouettes (a real miscompile we caught). The FMA form
    is exact-f32 and matches the XLA path (raytpu.ops.intersect uses the
    identical formulation) bit-for-bit. One reciprocal + three multiplies
    instead of three divides (the VPU divide is the slowest elementwise op
    here); the XLA path uses the identical recip-multiply.
    """
    n_rows = m_ref[0:C, :]
    c2_rows = m_ref[C : 2 * C, :]
    c3_rows = m_ref[2 * C : 3 * C, :]
    k0 = m_ref[3 * C : 4 * C, 0:1]  # (C, 1)

    def dot3(rows):
        return rows[:, 0:1] * dx + rows[:, 1:2] * dy + rows[:, 2:3] * dz

    denom = -dot3(n_rows)
    nonpar = denom != 0.0
    denom_safe = jnp.where(nonpar, denom, 1.0)
    recip = 1.0 / denom_safe
    t = k0 * recip
    u = dot3(c2_rows) * recip
    v = dot3(c3_rows) * recip
    ok = (
        (u + v <= 1.0) & (u >= 0.0) & (v >= 0.0) & (t >= 0.0) & nonpar
    )
    return t, ok


def _kernel(dirs_ref, m_ref, t_ref, idx_ref, best_t_ref, best_idx_ref, *,
            tri_chunk: int):
    """One (ray tile, triangle chunk) grid step.

    dirs_ref: (3, TILE_R) VMEM — same block for every chunk step.
    m_ref:    (4C, 3) VMEM — this chunk's rows
              [n_0..n_C | c2_0..c2_C | c3_0..c3_C | (k0, 0, 0)_0..C];
              invalid triangles have zeroed constants (denominator 0
              excludes them, matching the reference's inf/NaN compares).
    t_ref, idx_ref: (1, TILE_R) outputs (written on the last chunk step).
    best_t_ref, best_idx_ref: (1, TILE_R) VMEM scratch carried across
              chunk steps of one ray tile.
    """
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    C = tri_chunk
    dirs = dirs_ref[:, :]  # (3, TILE_R)

    @pl.when(c == 0)
    def _():
        best_t_ref[:, :] = jnp.full_like(best_t_ref[:, :], _F32MAX)
        best_idx_ref[:, :] = jnp.zeros_like(best_idx_ref[:, :])

    t, ok = _chunk_tuv(m_ref, C, dirs[0:1, :], dirs[1:2, :], dirs[2:3, :])
    tm = jnp.where(ok, t, _F32MAX)  # (C, TILE_R)

    chunk_min = jnp.min(tm, axis=0, keepdims=True)  # (1, TILE_R)
    rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, dimension=0)
    # Last triangle wins ties (`raytracer.cpp:243` >= update).
    chunk_idx = jnp.max(
        jnp.where(tm == chunk_min, rows, -1), axis=0, keepdims=True
    ) + c * C

    best_t = best_t_ref[:, :]
    upd = chunk_min <= best_t  # later chunks win ties
    best_t = jnp.where(upd, chunk_min, best_t)
    best_idx = jnp.where(upd, chunk_idx, best_idx_ref[:, :])
    best_t_ref[:, :] = best_t
    best_idx_ref[:, :] = best_idx

    @pl.when(c == n_chunks - 1)
    def _():
        t_ref[:, :] = best_t
        idx_ref[:, :] = jnp.where(best_t < _F32MAX, best_idx, -1)


def _tight_chunk(T: int, tri_chunk: int) -> int:
    """Chunk size: (C, TILE_R) temporaries dominate VMEM; C=128 keeps the
    working set ~a few MB at TILE_R=2048. Small scenes take a TIGHT
    chunk (T rounded up to the f32 sublane tile of 8) — padding the
    32-triangle Cornell box to C=128 would 4x the per-ray work."""
    return min(tri_chunk, 128, max(8, -(-T // 8) * 8))


def _blocked_constants(m, k0, valid, chunk):
    """Pad to a chunk multiple and pack the chunk-blocked row layout:
    per chunk [n | c2 | c3 | k0-row] (4C, 3); invalid triangles zeroed
    (denominator 0 => never a hit). Returns ((n_chunks*4C, 3), n_chunks).
    """
    T = ((m.shape[0] + chunk - 1) // chunk) * chunk
    padn = T - m.shape[0]
    if padn:
        m = jnp.concatenate(
            [m, jnp.zeros((padn, 3, 3), jnp.float32)], axis=0
        )
        k0 = jnp.concatenate([k0, jnp.zeros((padn,), jnp.float32)])
        valid = jnp.concatenate(
            [valid, jnp.zeros((padn,), jnp.float32)]
        )
    n_chunks = T // chunk
    m_masked = m * valid[:, None, None]
    k0_masked = k0 * valid
    mc = m_masked.reshape(n_chunks, chunk, 3, 3)
    k0c = k0_masked.reshape(n_chunks, chunk)
    k0_rows = jnp.stack(
        [k0c, jnp.zeros_like(k0c), jnp.zeros_like(k0c)], axis=-1
    )  # (n_chunks, C, 3)
    blocked = jnp.concatenate(
        [mc[:, :, 0, :], mc[:, :, 1, :], mc[:, :, 2, :], k0_rows], axis=1
    ).reshape(n_chunks * 4 * chunk, 3)
    return blocked, n_chunks


def _closest_hit_raw(dirs_t: jax.Array, m: jax.Array, k0: jax.Array,
                     valid: jax.Array, *, tile_r: int, tri_chunk: int):
    """dirs_t: (3, R). m: (T, 3, 3). Returns (t (R,), idx (R,))."""
    R = dirs_t.shape[1]
    if R % tile_r != 0:
        raise ValueError(f"ray count {R} not a multiple of {tile_r}")
    chunk = _tight_chunk(m.shape[0], tri_chunk)
    blocked, n_chunks = _blocked_constants(m, k0, valid, chunk)

    grid = (R // tile_r, n_chunks)  # chunk axis fastest
    kernel = functools.partial(_kernel, tri_chunk=chunk)
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * chunk, 3), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_r), jnp.float32),
            pltpu.VMEM((1, tile_r), jnp.int32),
        ],
        interpret=_interpret_mode(),
    )(dirs_t, blocked)
    return t[0], idx[0]


def _interpret_mode() -> bool:
    """Pallas TPU kernels run interpreted on CPU (tests)."""
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def closest_hit(dirs, m, k0, valid, tile_r=2048, tri_chunk=512):
    """Differentiable fused closest hit.

    Args:
      dirs: (R, 3) ray directions. m: (T, 3, 3) constants from
      tri_constants. k0: (T,). valid: (T,).
    Returns (t (R,), idx (R,)): ray parameter (F32MAX for miss), winner
    index (-1 for miss).
    """
    t, idx = _closest_hit_raw(
        dirs.T, m, k0, valid, tile_r=tile_r, tri_chunk=tri_chunk
    )
    return t, idx


def _fwd(dirs, m, k0, valid, tile_r, tri_chunk):
    t, idx = closest_hit(dirs, m, k0, valid, tile_r, tri_chunk)
    return (t, idx), (dirs, m, k0, t, idx)


def _bwd(tile_r, tri_chunk, res, cts):
    """Analytic VJP of t* = k0_i / (-d . n_i) at the winner i.

    d t*/d k0_i = 1/s;  d t*/d n_i = (t*/s) d;  d t*/d d = (t*/s) n_i
    with s = -(d . n_i). The winner index is piecewise-constant (no
    gradient), as is `valid`.
    """
    dirs, m, k0, t, idx = res
    t_bar, _ = cts
    T = m.shape[0]

    hit = idx >= 0
    i = jnp.maximum(idx, 0)
    if T <= 1024:
        # One-hot matmul gather/scatter: TPU scatters serialize; matmuls
        # don't. oh is (R, T) f32 — fine for small scenes.
        from raytpu.ops.intersect import gather_rows, one_hot_idx

        oh = one_hot_idx(i, T)
        n = gather_rows(oh, m[:, 0])  # (R, 3)
    else:
        oh = None
        n = m[i, 0]
    s = -jnp.sum(dirs * n, axis=-1)
    s_safe = jnp.where(jnp.abs(s) > 0.0, s, 1.0)
    t_hit = jnp.where(hit, t, 0.0)
    coef = jnp.where(hit, t_bar / s_safe, 0.0)  # (R,)

    g_dirs = (coef * t_hit)[:, None] * n
    g_n_rows = (coef * t_hit)[:, None] * dirs  # accumulate into m[., 0]
    if oh is not None:
        g_k0 = jax.lax.dot_general(
            oh, coef,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T,)
        g_n = jax.lax.dot_general(
            oh, g_n_rows,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, 3)
        g_m = jnp.zeros((T, 3, 3), jnp.float32).at[:, 0].set(g_n)
    else:
        g_k0 = jnp.zeros((T,), jnp.float32).at[i].add(coef)
        g_m = jnp.zeros((T, 3, 3), jnp.float32).at[i, 0].add(g_n_rows)
    return g_dirs, g_m, g_k0, None


closest_hit.defvjp(_fwd, _bwd)


def _fused_kernel(dirs_ref, blk_ref, org_ref, t_ref, idx_ref, occ_ref,
                  best_t_ref, best_idx_ref, d2_ref, occ_acc_ref, *,
                  tri_chunk: int, n_chunks: int):
    """Fused primary closest-hit + shadow any-hit occlusion.

    Two-phase grid over the (fastest) chunk axis c in [0, 2*n_chunks):
      c < n_chunks   — primary closest-hit chunk steps (camera-origin
                       constants), carrying (best_t, best_idx) scratch.
      c == n_chunks  — phase boundary: reconstruct hit positions
                       pos = cam + t*d, form the UNNORMALIZED shadow-ray
                       directions d2 = pos - light into scratch.
      c >= n_chunks  — shadow chunk steps (light-origin constants): any
                       valid intersection at ray parameter t < 0.99
                       occludes (`raytracer.cpp:310-315` with d2 scaling:
                       t is the fraction of the light distance).
    Everything stays in VMEM between phases — the only HBM traffic is the
    ray tile in and (t, idx, occluded) out.

    org_ref: (8, 128) params block; camera position at [0:3, 0], light
    position at [3:6, 0].
    """
    c = pl.program_id(1)
    C = tri_chunk

    @pl.when(c == 0)
    def _():
        best_t_ref[:, :] = jnp.full_like(best_t_ref[:, :], _F32MAX)
        best_idx_ref[:, :] = jnp.zeros_like(best_idx_ref[:, :])

    @pl.when(c < n_chunks)
    def _primary():
        dirs = dirs_ref[:, :]
        t, ok = _chunk_tuv(blk_ref, C, dirs[0:1, :], dirs[1:2, :],
                           dirs[2:3, :])
        tm = jnp.where(ok, t, _F32MAX)
        chunk_min = jnp.min(tm, axis=0, keepdims=True)
        rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, dimension=0)
        # Last triangle wins ties (`raytracer.cpp:243` >= update).
        chunk_idx = jnp.max(
            jnp.where(tm == chunk_min, rows, -1), axis=0, keepdims=True
        ) + c * C
        best_t = best_t_ref[:, :]
        upd = chunk_min <= best_t
        best_t_ref[:, :] = jnp.where(upd, chunk_min, best_t)
        best_idx_ref[:, :] = jnp.where(upd, chunk_idx, best_idx_ref[:, :])

    @pl.when(c == n_chunks)
    def _boundary():
        dirs = dirs_ref[:, :]
        best_t = best_t_ref[:, :]
        tz = jnp.where(best_t < _F32MAX, best_t, 0.0)  # (1, TILE_R)
        # Same op order as the XLA path (hit_positions then delta):
        # pos = cam + t*d; d2 = pos - light.
        for i in range(3):
            cam_i = org_ref[i : i + 1, 0:1]
            light_i = org_ref[3 + i : 4 + i, 0:1]
            d2_ref[i : i + 1, :] = (
                cam_i + tz * dirs[i : i + 1, :]
            ) - light_i
        occ_acc_ref[:, :] = jnp.zeros_like(occ_acc_ref[:, :])

    @pl.when(c >= n_chunks)
    def _shadow():
        t, ok = _chunk_tuv(blk_ref, C, d2_ref[0:1, :], d2_ref[1:2, :],
                           d2_ref[2:3, :])
        occ = ok & (t < 0.99)
        any_occ = jnp.max(
            jnp.where(occ, 1.0, 0.0), axis=0, keepdims=True
        )  # (1, TILE_R)
        occ_acc_ref[:, :] = jnp.maximum(occ_acc_ref[:, :], any_occ)

    @pl.when(c == 2 * n_chunks - 1)
    def _emit():
        best_t = best_t_ref[:, :]
        t_ref[:, :] = best_t
        idx_ref[:, :] = jnp.where(best_t < _F32MAX, best_idx_ref[:, :], -1)
        occ_ref[:, :] = (occ_acc_ref[:, :] > 0.0).astype(jnp.int32)


def _fused_raw(dirs_t, m, k0, valid, m_l, k0_l, cam_pos, light_pos, *,
               tile_r: int, tri_chunk: int):
    """dirs_t: (3, R). Returns (t (R,), idx (R,), occluded (R,) int32)."""
    R = dirs_t.shape[1]
    if R % tile_r != 0:
        raise ValueError(f"ray count {R} not a multiple of {tile_r}")
    chunk = _tight_chunk(m.shape[0], tri_chunk)
    blk_p, n_chunks = _blocked_constants(m, k0, valid, chunk)
    blk_s, _ = _blocked_constants(m_l, k0_l, valid, chunk)
    blocked = jnp.concatenate([blk_p, blk_s], axis=0)
    org = jnp.zeros((8, 128), jnp.float32)
    org = org.at[0:3, 0].set(cam_pos)
    org = org.at[3:6, 0].set(light_pos)

    grid = (R // tile_r, 2 * n_chunks)  # chunk/phase axis fastest
    kernel = functools.partial(_fused_kernel, tri_chunk=chunk,
                               n_chunks=n_chunks)
    t, idx, occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * chunk, 3), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_r), jnp.float32),
            pltpu.VMEM((1, tile_r), jnp.int32),
            pltpu.VMEM((3, tile_r), jnp.float32),
            pltpu.VMEM((1, tile_r), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(dirs_t, blocked, org)
    return t[0], idx[0], occ[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def closest_hit_occluded(dirs, m, k0, valid, m_l, k0_l, cam_pos, light_pos,
                         tile_r=2048, tri_chunk=512):
    """Differentiable fused closest hit + hard-shadow occlusion.

    Returns (t (R,), idx (R,), occluded (R,) int32). t/idx are identical
    to closest_hit; occluded is the reference hard-shadow test
    (`raytracer.cpp:307-315`) evaluated in-kernel. The occlusion bit and
    the winner index are piecewise-constant (zero gradient a.e.); t
    carries the same analytic VJP as closest_hit.
    """
    return _fused_raw(dirs.T, m, k0, valid, m_l, k0_l, cam_pos, light_pos,
                      tile_r=tile_r, tri_chunk=tri_chunk)


def _fused_fwd(dirs, m, k0, valid, m_l, k0_l, cam_pos, light_pos, tile_r,
               tri_chunk):
    t, idx, occ = closest_hit_occluded(
        dirs, m, k0, valid, m_l, k0_l, cam_pos, light_pos, tile_r, tri_chunk
    )
    return (t, idx, occ), (dirs, m, k0, t, idx)


def _fused_bwd(tile_r, tri_chunk, res, cts):
    t_bar = cts[0]
    g_dirs, g_m, g_k0, _ = _bwd(tile_r, tri_chunk, res, (t_bar, None))
    return g_dirs, g_m, g_k0, None, None, None, None, None


closest_hit_occluded.defvjp(_fused_fwd, _fused_bwd)


def _fused_multi_kernel(dirs_ref, blk_ref, cam_ref, light_ref,
                        t_ref, idx_ref, occ_ref,
                        best_t_ref, best_idx_ref, pos_ref, *,
                        tri_chunk: int, n_chunks: int, n_src: int):
    """Fused primary closest-hit + S-source shadow occlusion.

    Generalizes _fused_kernel to S shadow sources (multi-light and/or
    jittered soft-shadow sample positions, `raytracer.cpp:272-315`): the
    grid chunk axis c runs [0, (1+S)*n_chunks); source s owns chunk steps
    [ (1+s)*n_chunks, (2+s)*n_chunks ). The light-position INPUT is routed
    per source by its block index map (8-row-strided blocks — the TPU
    sublane-dim block constraint is 8 rows); the occlusion OUTPUT is one
    full-height (S, TILE_R) block resident across all chunk steps, updated
    with a one-hot row mask (dynamic sublane stores are not supported).

    cam_ref:   (8, 128) camera position at [0:3, 0] (same block all steps).
    light_ref: (8, 128) THIS source's block; position at [0, 0:3].
    occ_ref:   (S, TILE_R) int32 — row s is source s's occlusion bit;
               zeroed at the phase boundary, max-accumulated per chunk.
    pos_ref:   (3, TILE_R) scratch — primary hit positions, written once at
               the phase boundary (c == n_chunks) and reused by every
               source (the whole point of the fusion: the S shadow passes
               share the primary result without touching HBM).
    """
    c = pl.program_id(1)
    C = tri_chunk

    @pl.when(c == 0)
    def _():
        best_t_ref[:, :] = jnp.full_like(best_t_ref[:, :], _F32MAX)
        best_idx_ref[:, :] = jnp.zeros_like(best_idx_ref[:, :])

    @pl.when(c < n_chunks)
    def _primary():
        dirs = dirs_ref[:, :]
        t, ok = _chunk_tuv(blk_ref, C, dirs[0:1, :], dirs[1:2, :],
                           dirs[2:3, :])
        tm = jnp.where(ok, t, _F32MAX)
        chunk_min = jnp.min(tm, axis=0, keepdims=True)
        rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, dimension=0)
        # Last triangle wins ties (`raytracer.cpp:243` >= update).
        chunk_idx = jnp.max(
            jnp.where(tm == chunk_min, rows, -1), axis=0, keepdims=True
        ) + c * C
        best_t = best_t_ref[:, :]
        upd = chunk_min <= best_t
        best_t_ref[:, :] = jnp.where(upd, chunk_min, best_t)
        best_idx_ref[:, :] = jnp.where(upd, chunk_idx, best_idx_ref[:, :])

    @pl.when(c == n_chunks)
    def _boundary():
        dirs = dirs_ref[:, :]
        best_t = best_t_ref[:, :]
        t_ref[:, :] = best_t
        idx_ref[:, :] = jnp.where(best_t < _F32MAX, best_idx_ref[:, :], -1)
        tz = jnp.where(best_t < _F32MAX, best_t, 0.0)
        # Same op order as the XLA path: pos = cam + t*d.
        for i in range(3):
            cam_i = cam_ref[i : i + 1, 0:1]
            pos_ref[i : i + 1, :] = cam_i + tz * dirs[i : i + 1, :]
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    @pl.when(c >= n_chunks)
    def _shadow():
        # UNNORMALIZED shadow direction d2 = pos - light: the reference's
        # `distance < 0.99 r` occlusion test (`raytracer.cpp:310-315`)
        # becomes the constant threshold t < 0.99 (see ops/shade.py).
        d2x = pos_ref[0:1, :] - light_ref[0:1, 0:1]
        d2y = pos_ref[1:2, :] - light_ref[0:1, 1:2]
        d2z = pos_ref[2:3, :] - light_ref[0:1, 2:3]
        t, ok = _chunk_tuv(blk_ref, C, d2x, d2y, d2z)
        occ = ok & (t < 0.99)
        any_occ = jnp.max(
            jnp.where(occ, 1, 0), axis=0, keepdims=True
        ).astype(jnp.int32)  # (1, TILE_R)
        s = c // n_chunks - 1
        src_rows = jax.lax.broadcasted_iota(
            jnp.int32, (n_src, any_occ.shape[1]), dimension=0
        )
        occ_ref[:, :] = jnp.where(
            src_rows == s,
            jnp.maximum(occ_ref[:, :], any_occ),
            occ_ref[:, :],
        )


def _fused_multi_raw(dirs_t, m, k0, valid, m_s, k0_s, cam_pos, src_pos, *,
                     tile_r: int, tri_chunk: int):
    """dirs_t: (3, R); m_s (S, T, 3, 3); k0_s (S, T); src_pos (S, 3).
    Returns (t (R,), idx (R,), occ (S, R) int32)."""
    R = dirs_t.shape[1]
    S = m_s.shape[0]
    if R % tile_r != 0:
        raise ValueError(f"ray count {R} not a multiple of {tile_r}")
    chunk = _tight_chunk(m.shape[0], tri_chunk)
    blk, n_chunks = _blocked_constants(m, k0, valid, chunk)
    blocks = [blk]
    for s in range(S):
        blk_s, _ = _blocked_constants(m_s[s], k0_s[s], valid, chunk)
        blocks.append(blk_s)
    blocked = jnp.concatenate(blocks, axis=0)
    cam = jnp.zeros((8, 128), jnp.float32).at[0:3, 0].set(cam_pos)
    # 8-row-strided light blocks (TPU block sublane dim must be 8-divisible
    # or full): source s's position lives at row 8*s, read as block s.
    lights = jnp.zeros((S * 8, 128), jnp.float32).at[::8, 0:3].set(src_pos)

    def src_row(i, c):
        del i
        return jnp.maximum(c // n_chunks - 1, 0)

    grid = (R // tile_r, (1 + S) * n_chunks)  # chunk/source axis fastest
    kernel = functools.partial(_fused_multi_kernel, tri_chunk=chunk,
                               n_chunks=n_chunks, n_src=S)
    t, idx, occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * chunk, 3), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, c: (src_row(i, c), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((S, R), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_r), jnp.float32),
            pltpu.VMEM((1, tile_r), jnp.int32),
            pltpu.VMEM((3, tile_r), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(dirs_t, blocked, cam, lights)
    return t[0], idx[0], occ


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def closest_hit_occluded_multi(dirs, m, k0, valid, m_s, k0_s, cam_pos,
                               src_pos, tile_r=2048, tri_chunk=512):
    """Differentiable fused closest hit + S-source shadow occlusion.

    One kernel launch covering every (light, soft-shadow sample) shadow
    source — the reference's per-sample shadow trace `raytracer.cpp:307-315`
    for all samples at once. Returns (t (R,), idx (R,), occ (S, R) int32).
    t carries the analytic closest_hit VJP; idx and occ are piecewise
    constant (zero gradient a.e.).
    """
    return _fused_multi_raw(dirs.T, m, k0, valid, m_s, k0_s, cam_pos,
                            src_pos, tile_r=tile_r, tri_chunk=tri_chunk)


def _fused_multi_fwd(dirs, m, k0, valid, m_s, k0_s, cam_pos, src_pos,
                     tile_r, tri_chunk):
    t, idx, occ = closest_hit_occluded_multi(
        dirs, m, k0, valid, m_s, k0_s, cam_pos, src_pos, tile_r, tri_chunk
    )
    return (t, idx, occ), (dirs, m, k0, t, idx)


def _fused_multi_bwd(tile_r, tri_chunk, res, cts):
    t_bar = cts[0]
    g_dirs, g_m, g_k0, _ = _bwd(tile_r, tri_chunk, res, (t_bar, None))
    return g_dirs, g_m, g_k0, None, None, None, None, None


closest_hit_occluded_multi.defvjp(_fused_multi_fwd, _fused_multi_bwd)


def _fused_multi_kernel_masked(mask_ref, dirs_ref, blk_ref, cam_ref,
                               light_ref, t_ref, idx_ref, occ_ref,
                               best_t_ref, best_idx_ref, pos_ref, *,
                               tri_chunk: int, n_chunks: int, n_src: int):
    """Chunk-culled _fused_multi_kernel (same math, bit-identical).

    mask_ref: (n_tiles * (1+S) * n_chunks,) int32 scalar-prefetch keep
    mask — primary-phase columns from kernels.cull.chunk_mask_for, shadow
    columns from kernels.cull.shadow_keep_mask. The phase-boundary step
    (hit reconstruction) and the output writes stay unconditional; only
    per-chunk plane-test math is skipped.
    """
    i = pl.program_id(0)
    c = pl.program_id(1)
    C = tri_chunk
    total = (1 + n_src) * n_chunks
    keep = mask_ref[i * total + c] != 0

    @pl.when(c == 0)
    def _():
        best_t_ref[:, :] = jnp.full_like(best_t_ref[:, :], _F32MAX)
        best_idx_ref[:, :] = jnp.zeros_like(best_idx_ref[:, :])

    @pl.when((c < n_chunks) & keep)
    def _primary():
        dirs = dirs_ref[:, :]
        t, ok = _chunk_tuv(blk_ref, C, dirs[0:1, :], dirs[1:2, :],
                           dirs[2:3, :])
        tm = jnp.where(ok, t, _F32MAX)
        chunk_min = jnp.min(tm, axis=0, keepdims=True)
        rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, dimension=0)
        # Last triangle wins ties (`raytracer.cpp:243` >= update).
        chunk_idx = jnp.max(
            jnp.where(tm == chunk_min, rows, -1), axis=0, keepdims=True
        ) + c * C
        best_t = best_t_ref[:, :]
        upd = chunk_min <= best_t
        best_t_ref[:, :] = jnp.where(upd, chunk_min, best_t)
        best_idx_ref[:, :] = jnp.where(upd, chunk_idx, best_idx_ref[:, :])

    @pl.when(c == n_chunks)
    def _boundary():
        dirs = dirs_ref[:, :]
        best_t = best_t_ref[:, :]
        t_ref[:, :] = best_t
        idx_ref[:, :] = jnp.where(best_t < _F32MAX, best_idx_ref[:, :], -1)
        tz = jnp.where(best_t < _F32MAX, best_t, 0.0)
        # Same op order as the XLA path: pos = cam + t*d.
        for i2 in range(3):
            cam_i = cam_ref[i2 : i2 + 1, 0:1]
            pos_ref[i2 : i2 + 1, :] = cam_i + tz * dirs[i2 : i2 + 1, :]
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    @pl.when((c >= n_chunks) & keep)
    def _shadow():
        d2x = pos_ref[0:1, :] - light_ref[0:1, 0:1]
        d2y = pos_ref[1:2, :] - light_ref[0:1, 1:2]
        d2z = pos_ref[2:3, :] - light_ref[0:1, 2:3]
        t, ok = _chunk_tuv(blk_ref, C, d2x, d2y, d2z)
        occ = ok & (t < 0.99)
        any_occ = jnp.max(
            jnp.where(occ, 1, 0), axis=0, keepdims=True
        ).astype(jnp.int32)  # (1, TILE_R)
        s = c // n_chunks - 1
        src_rows = jax.lax.broadcasted_iota(
            jnp.int32, (n_src, any_occ.shape[1]), dimension=0
        )
        occ_ref[:, :] = jnp.where(
            src_rows == s,
            jnp.maximum(occ_ref[:, :], any_occ),
            occ_ref[:, :],
        )


def _fused_multi_masked_raw(dirs_t, m, k0, valid, m_s, k0_s, cam_pos,
                            src_pos, mask, *, tile_r: int, tri_chunk: int):
    """Masked twin of _fused_multi_raw. mask: (n_tiles, (1+S)*n_chunks)."""
    R = dirs_t.shape[1]
    S = m_s.shape[0]
    if R % tile_r != 0:
        raise ValueError(f"ray count {R} not a multiple of {tile_r}")
    chunk = _tight_chunk(m.shape[0], tri_chunk)
    blk, n_chunks = _blocked_constants(m, k0, valid, chunk)
    blocks = [blk]
    for s in range(S):
        blk_s, _ = _blocked_constants(m_s[s], k0_s[s], valid, chunk)
        blocks.append(blk_s)
    blocked = jnp.concatenate(blocks, axis=0)
    cam = jnp.zeros((8, 128), jnp.float32).at[0:3, 0].set(cam_pos)
    lights = jnp.zeros((S * 8, 128), jnp.float32).at[::8, 0:3].set(src_pos)
    if mask.shape != (R // tile_r, (1 + S) * n_chunks):
        raise ValueError(
            f"mask shape {mask.shape} != "
            f"{(R // tile_r, (1 + S) * n_chunks)}"
        )

    def src_row(i, c, m_):
        del i, m_
        return (jnp.maximum(c // n_chunks - 1, 0), 0)

    grid = (R // tile_r, (1 + S) * n_chunks)
    kernel = functools.partial(_fused_multi_kernel_masked, tri_chunk=chunk,
                               n_chunks=n_chunks, n_src=S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * chunk, 3), lambda i, c, m_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, c, m_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), src_row,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, tile_r), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_r), jnp.float32),
            pltpu.VMEM((1, tile_r), jnp.int32),
            pltpu.VMEM((3, tile_r), jnp.float32),
        ],
    )
    t, idx, occ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((S, R), jnp.int32),
        ],
        interpret=_interpret_mode(),
    )(mask.reshape(-1), dirs_t, blocked, cam, lights)
    return t[0], idx[0], occ


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def closest_hit_occluded_multi_masked(dirs, m, k0, valid, m_s, k0_s,
                                      cam_pos, src_pos, mask,
                                      tile_r=2048, tri_chunk=512):
    """Chunk-culled closest_hit_occluded_multi.

    t and idx are bit-identical to the unmasked kernel; occ is specified
    (and bit-identical) only for rays that hit — miss rays' occlusion
    bits may be culled to 0 (kernels.cull.shadow_keep_mask contract;
    nothing downstream consumes them, composite zeroes misses)."""
    return _fused_multi_masked_raw(
        dirs.T, m, k0, valid, m_s, k0_s, cam_pos, src_pos, mask,
        tile_r=tile_r, tri_chunk=tri_chunk,
    )


def _fused_multi_masked_fwd(dirs, m, k0, valid, m_s, k0_s, cam_pos,
                            src_pos, mask, tile_r, tri_chunk):
    t, idx, occ = closest_hit_occluded_multi_masked(
        dirs, m, k0, valid, m_s, k0_s, cam_pos, src_pos, mask,
        tile_r, tri_chunk,
    )
    return (t, idx, occ), (dirs, m, k0, t, idx)


def _fused_multi_masked_bwd(tile_r, tri_chunk, res, cts):
    t_bar = cts[0]
    g_dirs, g_m, g_k0, _ = _bwd(tile_r, tri_chunk, res, (t_bar, None))
    return g_dirs, g_m, g_k0, None, None, None, None, None, None


closest_hit_occluded_multi_masked.defvjp(
    _fused_multi_masked_fwd, _fused_multi_masked_bwd
)


def _fused_masks(dirs_swz, scene_geom, valid, src_pos, cam_pos,
                 tile_r: int, chunk: int):
    """Build the (n_tiles, (1+S)*n_chunks) fused-kernel keep mask."""
    from raytpu.kernels.cull import (
        chunk_spheres,
        keep_mask,
        shadow_keep_mask,
        tile_cones,
    )

    v0, v1, v2 = scene_geom
    centers, radii = chunk_spheres(v0, v1, v2, valid, chunk)
    axes, cos_half = tile_cones(dirs_swz, tile_r)
    primary = keep_mask(cam_pos, axes, cos_half, centers, radii)
    shadow = shadow_keep_mask(primary, centers, radii, src_pos)
    n_tiles = primary.shape[0]
    return jnp.concatenate(
        [primary, shadow.reshape(n_tiles, -1)], axis=1
    )


def intersect_occluded_multi_pallas(
    dirs: jax.Array, consts: TriConstants, consts_src: TriConstants,
    cam_pos: jax.Array, src_pos: jax.Array,
    tile_r: int = 2048, tri_chunk: int = 512,
    scene_geom: tuple | None = None, image_hw: tuple | None = None,
) -> tuple[Hits, jax.Array]:
    """Fused primary intersect + occlusion toward S shadow sources.

    consts_src: TriConstants with batched leaves — m (S, T, 3, 3),
    k0 (S, T) from ``jax.vmap(lambda o: tri_constants(scene, o))(src_pos)``.
    Returns (Hits, occluded (S, R) bool). Pads the ray count internally.

    scene_geom: optional (v0, v1, v2) vertex arrays (same triangle order
    as consts) — enables conservative chunk culling for multi-chunk
    scenes (bit-identical results; see kernels.cull). image_hw: (H, W)
    when rays are a row-major pixel grid, for spatially-tight ray tiles.
    """
    R = dirs.shape[0]
    chunk = _tight_chunk(consts.m.shape[0], tri_chunk)
    n_chunks = -(-consts.m.shape[0] // chunk)
    tiled = _tile_shape(image_hw, tile_r) if scene_geom else None
    if scene_geom is not None and n_chunks > 1:
        if tiled is not None:
            th, tw = tiled
            H, W = image_hw
            dirs_p = _swizzle(dirs, H, W, th, tw)
        elif (-R) % tile_r:
            pad = (-R) % tile_r
            dirs_p = jnp.concatenate(
                [dirs, jnp.tile(dirs[-1:], (pad, 1))], axis=0
            )
        else:
            dirs_p = dirs
        mask = _fused_masks(dirs_p, scene_geom, consts.valid, src_pos,
                            cam_pos, tile_r, chunk)
        t, idx, occ = closest_hit_occluded_multi_masked(
            dirs_p, consts.m, consts.k0, consts.valid,
            consts_src.m, consts_src.k0, cam_pos, src_pos, mask,
            tile_r, tri_chunk,
        )
        if tiled is not None:
            t = _unswizzle(t, H, W, th, tw)
            idx = _unswizzle(idx, H, W, th, tw)
            occ = _unswizzle(occ.T, H, W, th, tw).T
        else:
            t = t[:R]
            idx = idx[:R]
            occ = occ[:, :R]
        hit = t < _F32MAX
        # Contract: occlusion bits are DEFINED (0) on primary-miss lanes.
        # Without this, culling may zero some miss-lane bits the unculled
        # kernel would set — consumers today mask misses via composite(),
        # but debug dumps / future shading terms must not read junk.
        return (
            Hits(t=t, idx=idx.astype(jnp.int32), hit=hit),
            occ.astype(bool) & hit[None, :],
        )

    pad = (-R) % tile_r
    if pad:
        dirs_p = jnp.concatenate(
            [dirs, jnp.ones((pad, 3), dirs.dtype)], axis=0
        )
    else:
        dirs_p = dirs
    t, idx, occ = closest_hit_occluded_multi(
        dirs_p, consts.m, consts.k0, consts.valid,
        consts_src.m, consts_src.k0, cam_pos, src_pos,
        tile_r, tri_chunk,
    )
    t = t[:R]
    idx = idx[:R]
    hit = t < _F32MAX
    # Same defined-on-miss contract as the culled branch above.
    return (
        Hits(t=t, idx=idx.astype(jnp.int32), hit=hit),
        occ[:, :R].astype(bool) & hit[None, :],
    )


def _occlusion_multi_kernel(pos_ref, blk_ref, light_ref, occ_ref, *,
                            tri_chunk: int, n_chunks: int, n_src: int):
    """Shadow-only multi-source occlusion (no primary phase).

    For sharded rendering the primary closest hit must be merged ACROSS
    devices before shadow rays exist (the hit position is global state),
    so the single-launch fused kernel doesn't apply; this kernel runs the
    S per-source shadow sweeps against the local triangle block given
    precomputed surface positions. Grid chunk axis c in [0, S*n_chunks);
    source s = c // n_chunks. Same block-index-map routing and one-hot
    row accumulation as _fused_multi_kernel.
    """
    c = pl.program_id(1)
    C = tri_chunk

    @pl.when(c == 0)
    def _():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    d2x = pos_ref[0:1, :] - light_ref[0:1, 0:1]
    d2y = pos_ref[1:2, :] - light_ref[0:1, 1:2]
    d2z = pos_ref[2:3, :] - light_ref[0:1, 2:3]
    t, ok = _chunk_tuv(blk_ref, C, d2x, d2y, d2z)
    occ = ok & (t < 0.99)
    any_occ = jnp.max(
        jnp.where(occ, 1, 0), axis=0, keepdims=True
    ).astype(jnp.int32)
    s = c // n_chunks
    src_rows = jax.lax.broadcasted_iota(
        jnp.int32, (n_src, any_occ.shape[1]), dimension=0
    )
    occ_ref[:, :] = jnp.where(
        src_rows == s,
        jnp.maximum(occ_ref[:, :], any_occ),
        occ_ref[:, :],
    )


def _occlusion_multi_kernel_masked(mask_ref, pos_ref, blk_ref, light_ref,
                                   occ_ref, *, tri_chunk: int,
                                   n_chunks: int, n_src: int):
    """Chunk-culled _occlusion_multi_kernel (bit-identical occ bits —
    position_shadow_mask is fully conservative, misses included)."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    C = tri_chunk

    @pl.when(c == 0)
    def _():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    @pl.when(mask_ref[i * (n_src * n_chunks) + c] != 0)
    def _chunk():
        d2x = pos_ref[0:1, :] - light_ref[0:1, 0:1]
        d2y = pos_ref[1:2, :] - light_ref[0:1, 1:2]
        d2z = pos_ref[2:3, :] - light_ref[0:1, 2:3]
        t, ok = _chunk_tuv(blk_ref, C, d2x, d2y, d2z)
        occ = ok & (t < 0.99)
        any_occ = jnp.max(
            jnp.where(occ, 1, 0), axis=0, keepdims=True
        ).astype(jnp.int32)
        s = c // n_chunks
        src_rows = jax.lax.broadcasted_iota(
            jnp.int32, (n_src, any_occ.shape[1]), dimension=0
        )
        occ_ref[:, :] = jnp.where(
            src_rows == s,
            jnp.maximum(occ_ref[:, :], any_occ),
            occ_ref[:, :],
        )


def occlusion_multi_pallas(
    pos: jax.Array, consts_src: TriConstants, src_pos: jax.Array,
    valid: jax.Array, tile_r: int = 2048, tri_chunk: int = 512,
    scene_geom: tuple | None = None, image_hw: tuple | None = None,
) -> jax.Array:
    """Occlusion of S shadow sources toward precomputed surface positions.

    pos: (R, 3) surface points; consts_src: batched TriConstants
    (m (S, T, 3, 3), k0 (S, T)); src_pos: (S, 3); valid: (T,).
    Returns occluded (S, R) bool. Non-differentiable (occlusion is
    piecewise-constant); inputs are gradient-stopped.

    scene_geom: optional (v0, v1, v2) — enables chunk culling from
    per-tile position bounds (kernels.cull.position_shadow_mask; fully
    conservative, bit-identical occ for every ray). image_hw: (H, W) for
    spatially-tight pixel-block tiles.
    """
    pos = jax.lax.stop_gradient(pos)
    m_s = jax.lax.stop_gradient(consts_src.m)
    k0_s = jax.lax.stop_gradient(consts_src.k0)
    src_pos = jax.lax.stop_gradient(src_pos)
    valid = jax.lax.stop_gradient(valid)

    R = pos.shape[0]
    S = m_s.shape[0]
    T = m_s.shape[1]
    chunk = _tight_chunk(T, tri_chunk)
    blocks = []
    for s in range(S):
        blk_s, n_chunks = _blocked_constants(m_s[s], k0_s[s], valid, chunk)
        blocks.append(blk_s)
    blocked = jnp.concatenate(blocks, axis=0)
    lights = jnp.zeros((S * 8, 128), jnp.float32).at[::8, 0:3].set(src_pos)

    cull = scene_geom is not None and n_chunks > 1
    tiled = _tile_shape(image_hw, tile_r) if cull else None
    if tiled is not None:
        th, tw = tiled
        H, W = image_hw
        pos_swz = _swizzle(pos, H, W, th, tw)
        pos_t = pos_swz.T
        Rp = R
    else:
        pad = (-R) % tile_r
        pos_swz = pos
        pos_t = pos.T
        if pad:
            # Replicate the last real position (junk pads would blow up
            # the last tile's position bound when culling).
            pos_t = jnp.concatenate(
                [pos_t, jnp.tile(pos_t[:, -1:], (1, pad))], axis=1
            )
            pos_swz = pos_t.T
        Rp = R + pad

    if cull:
        from raytpu.kernels.cull import chunk_spheres, position_shadow_mask

        v0, v1, v2 = scene_geom
        centers, radii = chunk_spheres(v0, v1, v2, valid, chunk)
        mask = position_shadow_mask(pos_swz, src_pos, centers, radii,
                                    tile_r).reshape(Rp // tile_r, -1)
        kernel = functools.partial(_occlusion_multi_kernel_masked,
                                   tri_chunk=chunk, n_chunks=n_chunks,
                                   n_src=S)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Rp // tile_r, S * n_chunks),
            in_specs=[
                pl.BlockSpec((3, tile_r), lambda i, c, m_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * chunk, 3), lambda i, c, m_: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i, c, m_: (c // n_chunks, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, tile_r), lambda i, c, m_: (0, i),
                                   memory_space=pltpu.VMEM),
        )
        occ = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, Rp), jnp.int32),
            interpret=_interpret_mode(),
        )(mask.reshape(-1), pos_t, blocked, lights)
        if tiled is not None:
            occ = _unswizzle(occ.T, H, W, th, tw).T
        else:
            occ = occ[:, :R]
        return occ.astype(bool)

    grid = (Rp // tile_r, S * n_chunks)
    kernel = functools.partial(_occlusion_multi_kernel, tri_chunk=chunk,
                               n_chunks=n_chunks, n_src=S)
    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * chunk, 3), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, c: (c // n_chunks, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, tile_r), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Rp), jnp.int32),
        interpret=_interpret_mode(),
    )(pos_t, blocked, lights)
    return occ[:, :R].astype(bool)


def intersect_occluded_pallas(
    dirs: jax.Array, consts: TriConstants, consts_light: TriConstants,
    cam_pos: jax.Array, light_pos: jax.Array,
    tile_r: int = 2048, tri_chunk: int = 512,
) -> tuple[Hits, jax.Array]:
    """Fused primary intersect + hard-shadow occlusion toward one light.

    Returns (Hits, occluded (R,) bool). Pads the ray count internally.
    """
    R = dirs.shape[0]
    pad = (-R) % tile_r
    if pad:
        dirs_p = jnp.concatenate(
            [dirs, jnp.ones((pad, 3), dirs.dtype)], axis=0
        )
    else:
        dirs_p = dirs
    t, idx, occ = closest_hit_occluded(
        dirs_p, consts.m, consts.k0, consts.valid,
        consts_light.m, consts_light.k0, cam_pos, light_pos,
        tile_r, tri_chunk,
    )
    t = t[:R]
    idx = idx[:R]
    hit = t < _F32MAX
    return (
        Hits(t=t, idx=idx.astype(jnp.int32), hit=hit),
        occ[:R].astype(bool),
    )


def _kernel_masked(mask_ref, dirs_ref, m_ref, t_ref, idx_ref,
                   best_t_ref, best_idx_ref, *, tri_chunk: int):
    """Chunk-culled variant of _kernel (same math, bit-identical results).

    mask_ref: (n_tiles * n_chunks,) int32 scalar-prefetch keep-mask from
    kernels.cull — SMEM-resident before the body runs. A culled
    (tile, chunk) step costs one scalar load; kept steps run the exact
    _kernel chunk math, so the winning (t, idx) never differs from the
    brute-force kernel (the mask is conservative by construction).
    """
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    C = tri_chunk

    @pl.when(c == 0)
    def _():
        best_t_ref[:, :] = jnp.full_like(best_t_ref[:, :], _F32MAX)
        best_idx_ref[:, :] = jnp.zeros_like(best_idx_ref[:, :])

    @pl.when(mask_ref[i * n_chunks + c] != 0)
    def _chunk():
        dirs = dirs_ref[:, :]
        t, ok = _chunk_tuv(m_ref, C, dirs[0:1, :], dirs[1:2, :],
                           dirs[2:3, :])
        tm = jnp.where(ok, t, _F32MAX)
        chunk_min = jnp.min(tm, axis=0, keepdims=True)
        rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, dimension=0)
        # Last triangle wins ties (`raytracer.cpp:243` >= update).
        chunk_idx = jnp.max(
            jnp.where(tm == chunk_min, rows, -1), axis=0, keepdims=True
        ) + c * C
        best_t = best_t_ref[:, :]
        upd = chunk_min <= best_t
        best_t_ref[:, :] = jnp.where(upd, chunk_min, best_t)
        best_idx_ref[:, :] = jnp.where(upd, chunk_idx, best_idx_ref[:, :])

    @pl.when(c == n_chunks - 1)
    def _():
        best_t = best_t_ref[:, :]
        t_ref[:, :] = best_t
        idx_ref[:, :] = jnp.where(best_t < _F32MAX, best_idx_ref[:, :], -1)


def _closest_hit_masked_raw(dirs_t, m, k0, valid, mask, *, tile_r: int,
                            tri_chunk: int):
    """dirs_t: (3, R); mask: (n_tiles, n_chunks) int32. -> (t, idx)."""
    R = dirs_t.shape[1]
    if R % tile_r != 0:
        raise ValueError(f"ray count {R} not a multiple of {tile_r}")
    chunk = _tight_chunk(m.shape[0], tri_chunk)
    blocked, n_chunks = _blocked_constants(m, k0, valid, chunk)
    if mask.shape != (R // tile_r, n_chunks):
        raise ValueError(
            f"mask shape {mask.shape} != {(R // tile_r, n_chunks)}"
        )

    grid = (R // tile_r, n_chunks)  # chunk axis fastest
    kernel = functools.partial(_kernel_masked, tri_chunk=chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * chunk, 3), lambda i, c, m_: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, c, m_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_r), jnp.float32),
            pltpu.VMEM((1, tile_r), jnp.int32),
        ],
    )
    t, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        interpret=_interpret_mode(),
    )(mask.reshape(-1), dirs_t, blocked)
    return t[0], idx[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def closest_hit_masked(dirs, m, k0, valid, mask, tile_r=2048,
                       tri_chunk=512):
    """Differentiable chunk-culled fused closest hit.

    mask: (R // tile_r, n_chunks) int32 conservative keep-mask
    (kernels.cull.chunk_mask_for with the kernel's own chunk size).
    Same contract and bit-identical results as closest_hit.
    """
    return _closest_hit_masked_raw(
        dirs.T, m, k0, valid, mask, tile_r=tile_r, tri_chunk=tri_chunk
    )


def _masked_fwd(dirs, m, k0, valid, mask, tile_r, tri_chunk):
    t, idx = closest_hit_masked(dirs, m, k0, valid, mask, tile_r, tri_chunk)
    return (t, idx), (dirs, m, k0, t, idx)


def _masked_bwd(tile_r, tri_chunk, res, cts):
    # The winner's analytic VJP doesn't involve the mask (a culled chunk
    # never wins — conservative mask), so reuse _bwd verbatim.
    g_dirs, g_m, g_k0, _ = _bwd(tile_r, tri_chunk, res, cts)
    return g_dirs, g_m, g_k0, None, None


closest_hit_masked.defvjp(_masked_fwd, _masked_bwd)


def _tile_shape(image_hw, tile_r: int):
    """Pick a (th, tw) pixel block with th*tw == tile_r that divides the
    image — spatially TIGHT ray tiles are the whole cull lever (4 full
    512-px rows span the entire horizontal FOV; a 32x64 block spans a few
    degrees). None if the image can't be evenly blocked."""
    if image_hw is None:
        return None
    H, W = image_hw
    if H * W % tile_r:
        return None
    th = 1
    # Most-square factorization of tile_r that divides (H, W).
    for cand in range(int(tile_r ** 0.5), 0, -1):
        if tile_r % cand == 0 and H % cand == 0 and W % (tile_r // cand) == 0:
            th = cand
            break
    tw = tile_r // th
    if H % th or W % tw:
        return None
    return th, tw


def _swizzle(arr, H, W, th, tw):
    """(H*W, ...) row-major -> block-major (pure reshape/transpose)."""
    rest = arr.shape[1:]
    a = arr.reshape(H // th, th, W // tw, tw, *rest)
    return jnp.moveaxis(a, 1, 2).reshape(H * W, *rest)


def _unswizzle(arr, H, W, th, tw):
    """Inverse of _swizzle."""
    rest = arr.shape[1:]
    a = arr.reshape(H // th, W // tw, th, tw, *rest)
    return jnp.moveaxis(a, 2, 1).reshape(H * W, *rest)


def intersect_pallas_culled(dirs: jax.Array, consts: TriConstants,
                            origin: jax.Array, v0: jax.Array, v1: jax.Array,
                            v2: jax.Array, tile_r: int = 2048,
                            tri_chunk: int = 512,
                            image_hw: tuple | None = None) -> Hits:
    """Chunk-culled closest hit for common-origin rays.

    Bit-identical to intersect_pallas (the cull is conservative — see
    kernels.cull) but skips the chunk math for every (ray tile, triangle
    chunk) pair whose bounding cone provably misses the chunk's bounding
    sphere — the big-scene (STL) fast path. v0/v1/v2 are the scene
    vertices in the SAME order as consts; origin is the shared ray origin
    used to build consts.

    image_hw: (H, W) when the R rays are a row-major pixel grid — rays are
    then swizzled into (th, tw) pixel blocks so each kernel tile covers a
    narrow bounding cone (the swizzle is a pure reshape/transpose, and the
    per-ray outputs are un-swizzled back; winners are unaffected).
    """
    from raytpu.kernels.cull import chunk_mask_for

    R = dirs.shape[0]
    tiled = _tile_shape(image_hw, tile_r)
    if tiled is not None:
        th, tw = tiled
        H, W = image_hw
        dirs_p = _swizzle(dirs, H, W, th, tw)
        pad = 0
    else:
        pad = (-R) % tile_r
        if pad:
            # Replicate the last real ray: junk pad directions would blow
            # the last tile's bounding cone wide open and kill its cull
            # rate.
            dirs_p = jnp.concatenate(
                [dirs, jnp.tile(dirs[-1:], (pad, 1))], axis=0
            )
        else:
            dirs_p = dirs
    chunk = _tight_chunk(consts.m.shape[0], tri_chunk)
    mask = chunk_mask_for(origin, dirs_p, v0, v1, v2, consts.valid,
                          tile_r, chunk)
    t, idx = closest_hit_masked(dirs_p, consts.m, consts.k0, consts.valid,
                                mask, tile_r, tri_chunk)
    if tiled is not None:
        t = _unswizzle(t, H, W, th, tw)
        idx = _unswizzle(idx, H, W, th, tw)
    else:
        t = t[:R]
        idx = idx[:R]
    hit = t < _F32MAX
    return Hits(t=t, idx=idx.astype(jnp.int32), hit=hit)


def intersect_pallas(dirs: jax.Array, consts: TriConstants,
                     tile_r: int = 2048, tri_chunk: int = 512) -> Hits:
    """Drop-in replacement for raytpu.ops.intersect.intersect.

    Pads the ray count up to a tile multiple internally.
    """
    R = dirs.shape[0]
    pad = (-R) % tile_r
    if pad:
        dirs_p = jnp.concatenate(
            [dirs, jnp.ones((pad, 3), dirs.dtype)], axis=0
        )
    else:
        dirs_p = dirs
    t, idx = closest_hit(
        dirs_p, consts.m, consts.k0, consts.valid, tile_r, tri_chunk
    )
    t = t[:R]
    idx = idx[:R]
    hit = t < _F32MAX
    return Hits(t=t, idx=idx.astype(jnp.int32), hit=hit)
