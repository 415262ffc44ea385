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
from swnerf_tpu.parallel.tensor import (
    MODEL_AXIS,
    make_mesh_2d,
    mlp_param_specs,
    param_shardings,
    shard_train_state,
    tensor_parallel_setup,
    train_state_shardings,
)

__all__ = [
    "MODEL_AXIS",
    "RAYS_AXIS",
    "data_parallel_mesh",
    "make_mesh",
    "make_mesh_2d",
    "mlp_param_specs",
    "param_shardings",
    "rays_sharding",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_cli_step",
    "shard_train_state",
    "shard_train_step",
    "tensor_parallel_setup",
    "train_state_shardings",
]
