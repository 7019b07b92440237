"""Core runtime: device mesh construction, sharding helpers, precision."""

from tpucap.core.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    local_device_count,
    pad_to_multiple,
    pad_rows,
)
from tpucap.core.precision import Precision, DEFAULT_PRECISION

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "local_device_count",
    "pad_to_multiple",
    "pad_rows",
    "Precision",
    "DEFAULT_PRECISION",
]
