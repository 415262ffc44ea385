from swnerf_tpu.parallel.mesh import (
    RAYS_AXIS,
    data_parallel_mesh,
    make_mesh,
    rays_sharding,
    replicate,
    replicated,
    shard_batch,
    shard_cli_step,
    shard_train_step,
)

__all__ = [
    "RAYS_AXIS",
    "data_parallel_mesh",
    "make_mesh",
    "rays_sharding",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_cli_step",
    "shard_train_step",
]
