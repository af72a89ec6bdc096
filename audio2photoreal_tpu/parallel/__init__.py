from audio2photoreal_tpu.parallel.mesh import (
    MeshSpec,
    create_mesh,
    data_mesh,
    local_mesh,
)
from audio2photoreal_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    shard_batch,
    with_shardings,
)
from audio2photoreal_tpu.parallel.distributed import (
    initialize,
    local_batch_size,
    per_process_seed,
    shard_batch_global,
    slice_for_process,
)

__all__ = [
    "MeshSpec",
    "create_mesh",
    "data_mesh",
    "local_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "with_shardings",
    "initialize",
    "local_batch_size",
    "per_process_seed",
    "shard_batch_global",
    "slice_for_process",
]
