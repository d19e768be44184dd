from .mesh import (batch_sharding, create_mesh, device_count,  # noqa: F401
                   initialize_distributed, replicated, shard_batch)

__all__ = ["create_mesh", "batch_sharding", "replicated", "shard_batch",
           "initialize_distributed", "device_count"]
