"""Device mesh, sharding helpers, multi-host init."""

from .mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    initialize_distributed,
)
