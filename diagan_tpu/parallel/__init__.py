from diagan_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_chunk,
    replicate,
    shard_logit_gather,
)

__all__ = [
    "make_mesh",
    "make_sharded_train_chunk",
    "replicate",
    "shard_logit_gather",
]
