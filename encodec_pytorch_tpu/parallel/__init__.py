"""Device mesh, sharding helpers, multi-host init, tensor parallelism."""

from .mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    initialize_distributed,
)
from .tensor import (  # noqa: F401
    roundtrip_tp,
    shard_variables_tp,
    tp_shardings,
)
