from .mesh import (
    DATA_AXIS,
    batch_sharding,
    init_distributed,
    stage_global_batch,
    stage_replicated,
    data_parallel_extractor,
    addressable_rows,
    to_numpy_global,
    local_batch_slice,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "addressable_rows",
    "to_numpy_global",
    "local_batch_slice",
    "init_distributed",
    "stage_global_batch",
    "stage_replicated",
    "data_parallel_extractor",
]
