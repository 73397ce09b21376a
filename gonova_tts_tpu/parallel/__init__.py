"""Parallelism: device mesh, sharding rules, data/tensor-parallel placement."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    init_distributed,
    make_hybrid_mesh,
    make_mesh,
    param_shardings,
    param_spec,
    replicated,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "init_distributed",
    "make_hybrid_mesh",
    "make_mesh",
    "param_shardings",
    "param_spec",
    "replicated",
    "shard_params",
]
