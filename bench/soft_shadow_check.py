"""Hardware check + timing of the multi-source fused shadow kernel.

Validates on the real TPU that the fused multi-source path
(closest_hit_occluded_multi: one launch for primary + all L*S shadow
sources) renders identically to the separate-launch path, and measures
the soft-shadow forward frame time both ways.

Run: python bench/soft_shadow_check.py [size] [samples]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.utils.cache import enable as enable_cache

enable_cache()

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, Lights, RenderConfig
from raytpu.render.raytrace import raytrace_full

size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
samples = int(sys.argv[2]) if len(sys.argv) > 2 else 16

scene = cornell_box(pad_to=32)
cam = Camera.raytracer_default()
lights = Lights.single(capacity=1, soft_samples=samples)
cfg_f = RenderConfig(width=size, height=size, mode="clean",
                     soft_shadow_samples=samples, use_pallas=True)
cfg_j = cfg_f.replace(use_pallas=False)


def timed(tag, cfg):
    fwd = jax.jit(lambda s, l: raytrace_full(s, cam, l, cfg).image)
    t0 = time.time()
    img = jax.block_until_ready(fwd(scene, lights))
    print(f"[{tag}] compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    n = 10
    for _ in range(n):
        img = fwd(scene, lights)
    jax.block_until_ready(img)
    dt = (time.time() - t0) / n
    rays = (1 + samples) * size * size
    print(f"[{tag}] {dt*1e3:.2f} ms/frame -> {rays/dt/1e6:.0f} Mrays/s "
          f"({samples} soft-shadow samples)", flush=True)
    return np.asarray(img)


img_f = timed("fused-multi", cfg_f)
img_j = timed("xla-separate", cfg_j)

diff = np.abs(img_f - img_j)
nbad = int((diff > 0).sum())
print(f"pixel diffs: {nbad} / {img_f.size} (max {diff.max():.3e})")
assert nbad == 0, "fused multi path diverged from the XLA path"
print("OK: bit-equal on hardware")
