from uig.runtime.mesh import (
    batch_sharding,
    host_local_batch_size,
    make_mesh,
    pool_sharding,
    replicated,
    shard_batch,
)
from uig.runtime.prng import fold_step, split_named

__all__ = [
    "make_mesh",
    "batch_sharding",
    "pool_sharding",
    "replicated",
    "shard_batch",
    "host_local_batch_size",
    "fold_step",
    "split_named",
]
