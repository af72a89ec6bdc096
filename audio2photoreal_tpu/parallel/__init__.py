from audio2photoreal_tpu.parallel.mesh import (
    MeshSpec,
    create_mesh,
    local_mesh,
)
from audio2photoreal_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    shard_batch,
    with_shardings,
)

__all__ = [
    "MeshSpec",
    "create_mesh",
    "local_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "with_shardings",
]
