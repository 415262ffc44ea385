from swnerf_tpu.parallel.mesh import (
    RAYS_AXIS,
    make_mesh,
    rays_sharding,
    replicated,
    shard_batch,
    shard_train_step,
)

__all__ = [
    "RAYS_AXIS",
    "make_mesh",
    "rays_sharding",
    "replicated",
    "shard_batch",
    "shard_train_step",
]
