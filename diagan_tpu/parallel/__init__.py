from diagan_tpu.parallel.mesh import (
    AXIS,
    make_mesh,
    make_sharded_train_chunk,
    per_host_shard,
    replicate,
    shard_logit_gather,
)

__all__ = [
    "AXIS",
    "make_mesh",
    "make_sharded_train_chunk",
    "per_host_shard",
    "replicate",
    "shard_logit_gather",
]
