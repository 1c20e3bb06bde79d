from im23d_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_batch_pytree,
)

__all__ = ["make_mesh", "replicated", "batch_sharded", "shard_batch_pytree"]
