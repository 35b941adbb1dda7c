"""Multi-chip parallelism via jax.sharding over a device mesh."""

from phiseg_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_sharded_sample_fn,
    replicated_sharding,
    shard_array,
    shard_host_batch,
    shard_train_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_array",
    "shard_host_batch",
    "shard_train_step",
    "make_sharded_sample_fn",
]
