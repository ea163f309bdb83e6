"""Persistent XLA compilation cache.

Every fresh process pays full (remote) TPU compiles otherwise — minutes
for the Pallas kernels through this image's compile tunnel. The cache
keys on HLO + compiler version, so stale entries are never reused.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "raytpu_xla"
)


def enable(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get("RAYTPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
