"""Device mesh + data-parallel sharding utilities."""

from vae_cyclegan_tpu.parallel.dp import (
    dp_axis,
    dp_normal,
    dp_scope,
    eps_queue,
    sync,
)
from vae_cyclegan_tpu.parallel.mesh import (
    make_mesh,
    replicate_state,
    shard_batch,
    batch_sharding,
    replicated_sharding,
    spatial_size,
)
