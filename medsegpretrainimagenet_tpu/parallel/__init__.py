from .mesh import (batch_sharding, broadcast_from_main,  # noqa: F401
                   create_mesh, device_count, gather_tree_to_host,
                   initialize_distributed, is_main_process, put_replicated,
                   replicated, shard_batch)
from .pp import pipeline_apply, stack_stage_params  # noqa: F401
from .tp import shard_train_state, tensor_parallel_shardings  # noqa: F401

__all__ = ["create_mesh", "batch_sharding", "replicated",
           "put_replicated", "shard_batch",
           "initialize_distributed", "device_count", "is_main_process",
           "broadcast_from_main", "gather_tree_to_host",
           "tensor_parallel_shardings", "shard_train_state",
           "pipeline_apply", "stack_stage_params"]
