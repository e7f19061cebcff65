"""Mesh + sharding (DP over 'data', optional TP over 'model')."""

from .multihost import (
    host_batch_slice,
    initialize_multihost,
    local_to_global,
)
from .mesh import (
    batch_shardings,
    make_mesh,
    param_spec,
    replicated,
    shard_params,
)

__all__ = [
    "batch_shardings", "make_mesh", "param_spec", "replicated", "shard_params",
    "host_batch_slice", "initialize_multihost", "local_to_global",
]
