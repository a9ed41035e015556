from .fsdp import fsdp_shardings, place_fsdp, place_train_params_fsdp
from .mesh import batch_sharding, create_mesh, replicate, replicated, shard_batch

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "fsdp_shardings",
    "place_fsdp",
    "place_train_params_fsdp",
]
