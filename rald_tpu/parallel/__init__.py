from rald_tpu.parallel.mesh import (
    data_sharding,
    init_distributed,
    make_mesh,
    process_info,
    replicated,
    shard_batch,
)

__all__ = [
    "data_sharding",
    "init_distributed",
    "make_mesh",
    "process_info",
    "replicated",
    "shard_batch",
]
