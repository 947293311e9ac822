from .sharding import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "shard_batch",
    "shard_params",
]
