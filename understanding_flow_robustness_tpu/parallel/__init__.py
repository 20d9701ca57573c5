"""Device mesh + sharding helpers (data parallelism over ICI)."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
    shard_predict,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_predict",
]
