from cu2rec_tpu.parallel.sharded import (
    ShardedEngine, ShardedRatings, make_mesh, pad_model, shard_ratings,
    trim_model,
)

__all__ = ["ShardedEngine", "ShardedRatings", "make_mesh", "pad_model",
           "shard_ratings", "trim_model"]
