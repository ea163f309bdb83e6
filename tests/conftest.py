"""Test configuration.

Tests run on a CPU backend with 8 virtual devices so sharding logic is
exercised without TPU hardware (the standard JAX trick; SURVEY.md §4).
Set RAYTPU_TEST_TPU=1 to run the suite on the real accelerator instead.
"""

import os

if not os.environ.get("RAYTPU_TEST_TPU"):
    # The image pins JAX_PLATFORMS=axon (TPU tunnel) globally; override it —
    # per-op dispatch through the tunnel makes unit tests minutes-slow.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

REFERENCE_ROOT = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_ROOT, *parts)
