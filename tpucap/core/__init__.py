"""Core runtime: device mesh construction and sharding helpers."""

from tpucap.core.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    shard_stacked_batch,
    replicate_tree,
    local_device_count,
    pad_to_multiple,
    pad_rows,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_stacked_batch",
    "replicate_tree",
    "local_device_count",
    "pad_to_multiple",
    "pad_rows",
]
