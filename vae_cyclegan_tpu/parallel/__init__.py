"""Device mesh + data-parallel sharding utilities."""

from vae_cyclegan_tpu.parallel.mesh import (
    make_mesh,
    replicate_state,
    shard_batch,
    batch_sharding,
    replicated_sharding,
    spatial_size,
)
