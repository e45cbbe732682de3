from .mesh import (batch_sharding, create_mesh, pad_batch_to, replicate_tree,
                   replicated, shard_batch)

__all__ = ["create_mesh", "batch_sharding", "replicated", "shard_batch",
           "replicate_tree", "pad_batch_to"]
