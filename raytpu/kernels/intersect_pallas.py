"""Fused closest-hit Pallas kernel.

The jnp path (raytpu.ops.intersect) materializes (R, 3T) dot products and
several (R, T) intermediates in HBM — at 512^2 x 32 triangles that is
~600 MB of traffic per pass and the measured bottleneck (bench.py). This
kernel keeps everything on-chip:

  grid over ray tiles; per tile:
    VMEM <- dirs tile (3, TILE_R)           [lane axis = rays]
    VMEM <- all triangle constants (3T, 3)  [tiny: 9k tris = 340 KB]
    loop triangle chunks (C, .):
      prods = M_chunk (3C, 3) @ dirs (3, TILE_R)   -> MXU
      t,u,v tests + masked min-reduce over the chunk -> VPU
      carry running (best_t, best_idx)
    HBM <- (1, TILE_R) best_t, best_idx

HBM traffic drops to O(R) in+out. The closest-hit reduction reproduces the
reference semantics: Euclidean-equivalent t ordering with LAST-triangle
tie-break (`raytracer.cpp:243`).

The op carries a custom VJP: t* = k0_i / (-d . n_i) for the winning
triangle i, so the backward is a cheap per-ray gather + scatter-add — no
(R, T) replay (see raytpu guide: Patterns: Custom VJP).
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


def _kernel(dirs_ref, m_ref, k0_ref, valid_ref, t_ref, idx_ref, *,
            tri_chunk: int, n_tris: int):
    """One ray tile vs all triangles.

    dirs_ref:  (3, TILE_R) VMEM
    m_ref:     (3T, 3) VMEM — rows [n_0..n_T | c2_0..c2_T | c3_0..c3_T]
    k0_ref:    (T, 1) VMEM
    valid_ref: (T, 1) VMEM
    t_ref:     (1, TILE_R) out
    idx_ref:   (1, TILE_R) out (int32)
    """
    tile_r = dirs_ref.shape[1]
    dirs = dirs_ref[:, :]  # (3, TILE_R)
    n_chunks = n_tris // tri_chunk

    def body(c, carry):
        best_t, best_idx = carry
        base = c * tri_chunk
        # Gather this chunk's constant rows for each of the 3 planes.
        n_rows = m_ref[pl.ds(base, tri_chunk), :]               # (C, 3)
        c2_rows = m_ref[pl.ds(n_tris + base, tri_chunk), :]     # (C, 3)
        c3_rows = m_ref[pl.ds(2 * n_tris + base, tri_chunk), :]  # (C, 3)
        k0 = k0_ref[pl.ds(base, tri_chunk), :]                  # (C, 1)
        valid = valid_ref[pl.ds(base, tri_chunk), :]            # (C, 1)

        dn = jnp.dot(n_rows, dirs, preferred_element_type=jnp.float32)
        du = jnp.dot(c2_rows, dirs, preferred_element_type=jnp.float32)
        dv = jnp.dot(c3_rows, dirs, preferred_element_type=jnp.float32)

        denom = -dn
        nonpar = denom != 0.0
        denom_safe = jnp.where(nonpar, denom, 1.0)
        t = k0 / denom_safe
        u = du / denom_safe
        v = dv / denom_safe
        ok = (
            (u + v <= 1.0) & (u >= 0.0) & (v >= 0.0) & (t >= 0.0)
            & nonpar & (valid > 0.0)
        )
        tm = jnp.where(ok, t, _F32MAX)  # (C, TILE_R)

        chunk_min = jnp.min(tm, axis=0, keepdims=True)  # (1, TILE_R)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, tm.shape, dimension=0
        )
        # Last triangle wins ties (`raytracer.cpp:243` >= update).
        chunk_idx = jnp.max(
            jnp.where(tm == chunk_min, rows, -1), axis=0, keepdims=True
        ) + base

        upd = chunk_min <= best_t  # later chunks win ties
        return (
            jnp.where(upd, chunk_min, best_t),
            jnp.where(upd, chunk_idx, best_idx),
        )

    init = (
        jnp.full((1, tile_r), _F32MAX, jnp.float32),
        jnp.zeros((1, tile_r), jnp.int32),
    )
    best_t, best_idx = jax.lax.fori_loop(0, n_chunks, body, init)
    t_ref[:, :] = best_t
    idx_ref[:, :] = jnp.where(best_t < _F32MAX, best_idx, -1)


def _closest_hit_raw(dirs_t: jax.Array, m: jax.Array, k0: jax.Array,
                     valid: jax.Array, *, tile_r: int, tri_chunk: int):
    """dirs_t: (3, R). m: (T, 3, 3). Returns (t (R,), idx (R,))."""
    T = m.shape[0]
    R = dirs_t.shape[1]
    if R % tile_r != 0:
        raise ValueError(f"ray count {R} not a multiple of {tile_r}")
    # VMEM budget: the chunk loop keeps ~8 (C, TILE_R) f32 live; cap C so
    # that stays under ~8 MB of the ~16 MB VMEM.
    vmem_cap = max(8, (8 * 1024 * 1024) // (tile_r * 32))
    chunk = min(tri_chunk, T, vmem_cap)
    while T % chunk != 0:
        chunk -= 1
    if chunk < 1:
        raise ValueError(f"no valid chunk size for T={T}")

    # Row layout [n | c2 | c3] grouped by constant type.
    m_rows = m.transpose(1, 0, 2).reshape(3 * T, 3)

    grid = (R // tile_r,)
    kernel = functools.partial(_kernel, tri_chunk=chunk, n_tris=T)
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * T, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        interpret=_interpret_mode(),
    )(dirs_t, m_rows, k0[:, None], valid[:, None])
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
