"""Sharding / multi-host layer (SPMD replacement for the reference's
OpenMP pragmas — SURVEY.md §2.5, §5.8)."""

from raytpu.parallel.distributed import (
    DistributedState,
    init_distributed,
    shutdown_distributed,
)
from raytpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    replicated,
    row_sharding,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "DistributedState",
    "init_distributed",
    "make_mesh",
    "replicated",
    "row_sharding",
    "shutdown_distributed",
]
