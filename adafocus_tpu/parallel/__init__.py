from adafocus_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_train_step,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "shard_train_step"]
