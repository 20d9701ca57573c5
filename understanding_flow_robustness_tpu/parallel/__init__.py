"""Device mesh + sharding helpers (data + spatial parallelism over ICI)."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
    shard_predict,
)
from .spatial import (
    SPATIAL_AXIS,
    check_spatial_shapes,
    image_sharding,
    make_2d_mesh,
    spatial_predict,
)

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "batch_sharding",
    "check_spatial_shapes",
    "image_sharding",
    "make_2d_mesh",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_predict",
    "spatial_predict",
]
