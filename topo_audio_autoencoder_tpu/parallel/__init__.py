"""Parallelism: 1-D data-parallel mesh + sharding helpers."""

from .mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "replicated",
    "shard_batch",
]
