"""Test configuration.

Tests run on a CPU backend with 8 virtual devices so sharding logic is
exercised without TPU hardware (the standard JAX trick; SURVEY.md §4).
Set RAYTPU_TEST_TPU=1 to run the suite on the real accelerator instead.
"""

import os

if not os.environ.get("RAYTPU_TEST_TPU"):
    # The image pins JAX_PLATFORMS=axon (TPU tunnel) globally, and the
    # sitecustomize's axon.register() additionally calls
    # jax.config.update("jax_platforms", "axon,cpu") at interpreter start —
    # so the env var alone is not enough; override the config after import.
    # Per-op dispatch through the tunnel makes unit tests minutes-slow.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_ROOT, *parts)
