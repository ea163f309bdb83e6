"""Lab0 starfield demo — batched point splatting + interpolation utilities.

Covers the reference warm-up project (`Lab0/template/Source/skeleton.cpp`):
1,000 random stars in [-1,1]^2 x (0,1], advanced by ``z -= dt/1000`` with
wraparound (`skeleton.cpp:61-69`), pinhole-projected with f = H/2 and drawn
with brightness ``0.2 / z^2`` (`skeleton.cpp:129-141`). The per-star loop
becomes a vectorized scatter; the lerp helpers (`skeleton.cpp:151-169`)
map to jnp.linspace semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def init_stars(key: jax.Array, n: int = 1000) -> jax.Array:
    """(n, 3) stars: x,y ~ U[-1,1], z ~ U[0,1] (`skeleton.cpp:31-38`)."""
    kx, ky, kz = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (n,), jnp.float32, -1.0, 1.0)
    y = jax.random.uniform(ky, (n,), jnp.float32, -1.0, 1.0)
    z = jax.random.uniform(kz, (n,), jnp.float32, 0.0, 1.0)
    return jnp.stack([x, y, z], axis=-1)


@jax.jit
def update_stars(stars: jax.Array, dt_ms: jax.Array) -> jax.Array:
    """Advance star depth with wraparound (`skeleton.cpp:61-69`)."""
    z = stars[:, 2] - dt_ms / 1000.0
    z = jnp.where(z <= 0.0, z + 1.0, z)
    z = jnp.where(z > 1.0, z - 1.0, z)
    return stars.at[:, 2].set(z)


@partial(jax.jit, static_argnames=("width", "height"))
def draw_stars(stars: jax.Array, width: int = 500,
               height: int = 500) -> jax.Array:
    """Project + splat stars into an (H, W, 3) image.

    Pinhole u = f*x/z + W/2 with f = H/2 (`skeleton.cpp:135-137`),
    brightness 0.2/z^2 (`:139`). Out-of-frame stars are dropped (PutPixelSDL
    bounds check, `SDLauxiliary.h:72-73`). Multiple stars on one pixel:
    the reference overwrites in order — scatter-max approximates the final
    brightness (stars are unordered; identical for non-colliding splats).
    """
    f = jnp.float32(height / 2)
    x, y, z = stars[:, 0], stars[:, 1], stars[:, 2]
    u = (f * (x / z) + width / 2.0).astype(jnp.int32)
    v = (f * (y / z) + height / 2.0).astype(jnp.int32)
    brightness = 0.2 / (z * z)
    ok = (u >= 0) & (u < width) & (v >= 0) & (v < height)
    u = jnp.where(ok, u, 0)
    v = jnp.where(ok, v, 0)
    brightness = jnp.where(ok, brightness, 0.0)
    img = jnp.zeros((height, width), jnp.float32)
    img = img.at[v, u].max(brightness)
    return jnp.repeat(img[..., None], 3, axis=-1)


def interpolate(a, b, n: int) -> jax.Array:
    """1-D/3-D lerp helper (`skeleton.cpp:151-169`): n evenly spaced values
    from a to b inclusive (step (b-a)/(n-1))."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if n == 1:
        return a[None]
    t = jnp.arange(n, dtype=jnp.float32) / jnp.float32(n - 1)
    return a + t.reshape((n,) + (1,) * a.ndim) * (b - a)


def bilinear_fill(top_left, top_right, bottom_left, bottom_right,
                  width: int, height: int) -> jax.Array:
    """Bilinear color-gradient screen fill (`skeleton.cpp:94-121`)."""
    left = interpolate(top_left, bottom_left, height)    # (H, 3)
    right = interpolate(top_right, bottom_right, height)  # (H, 3)
    t = jnp.arange(width, dtype=jnp.float32) / jnp.float32(max(width - 1, 1))
    return left[:, None, :] + t[None, :, None] * (
        right[:, None, :] - left[:, None, :]
    )
