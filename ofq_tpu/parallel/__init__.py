"""Mesh + sharding (DP over 'data', optional TP over 'model')."""

from .mesh import (
    batch_shardings,
    make_mesh,
    param_spec,
    replicated,
    shard_params,
)

__all__ = [
    "batch_shardings", "make_mesh", "param_spec", "replicated", "shard_params",
]
