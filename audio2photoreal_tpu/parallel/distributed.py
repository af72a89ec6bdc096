"""Multi-host (multi-process) bootstrap.

The reference scaffolds torch multi-process training but never initializes it
(reference: utils/misc.py:29-48 `init_distributed` + train/train_diffusion.py:57-83
`mp.spawn` behind a `world_size > 1` branch that the published configs never
take).  The TPU-native replacement is real and minimal:

- ``initialize()`` — flag-gated ``jax.distributed.initialize``; after it, every
  host sees the GLOBAL device set and a single ``Mesh`` spans the pod slice.
  Collectives ride ICI within a slice and DCN across slices purely by mesh
  layout (SURVEY §2.8).
- per-process batch slicing — each process loads ONLY its shard of the global
  batch (``local_batch_size``); random-window samplers draw from independent,
  process-folded seed streams (``per_process_seed``), the role torch's
  DistributedSampler plays for map-style datasets.
- ``shard_batch_global`` — assembles a GLOBAL jax.Array from each process's
  host-local shard (``jax.make_array_from_process_local_data``); on one
  process it degrades to a plain sharded device_put, so trainers call one
  function in both worlds.

Single-process behavior is bit-identical to the pre-multi-host code path:
``initialize`` is a no-op unless asked, and all helpers treat
process_count == 1 as the trivial slice.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio2photoreal_tpu.parallel.mesh import DATA_AXIS

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Flag-gated ``jax.distributed.initialize``.

    Call BEFORE any other jax API touches the backend (device queries included).
    With no arguments, initialization is attempted only when the standard
    launcher environment is present (TPU pod runtime / SLURM / Open MPI — the
    auto-detection built into jax.distributed); a bare single-host run stays a
    no-op.  Returns True when a multi-process runtime is active afterwards.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    explicit = coordinator_address is not None
    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    else:
        import os

        # auto-detect ONLY when a launcher environment is visibly present —
        # attempting jax.distributed.initialize() blind can hang probing pod
        # metadata on an isolated host
        markers = (
            "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
            "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE", "TPU_WORKER_HOSTNAMES",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
        if not any(os.environ.get(m) for m in markers):
            return False
        try:
            jax.distributed.initialize()
            _initialized = True
        except Exception:
            return False
    return jax.process_count() > 1


def process_counts() -> Tuple[int, int]:
    """(process_index, process_count) of the current runtime."""
    return jax.process_index(), jax.process_count()


def local_batch_size(
    global_batch_size: int,
    process_count: Optional[int] = None,
) -> int:
    """Per-process share of the global batch; must divide evenly — a silent
    remainder would desync the global array assembly across hosts."""
    pc = jax.process_count() if process_count is None else process_count
    if global_batch_size % pc != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {pc} processes"
        )
    return global_batch_size // pc


def slice_for_process(
    n: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> slice:
    """Deterministic contiguous shard of ``range(n)`` for this process —
    the fixed-order analogue (eval splits, scene lists) of the seed-stream
    slicing used for random window sampling.  All items are covered exactly
    once when n % process_count == 0; otherwise the first ``n % pc``
    processes carry one extra item (torch DistributedSampler pads instead —
    padding duplicates samples, which corrupts eval metrics, so we don't)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, extra = divmod(n, pc)
    start = pi * base + min(pi, extra)
    return slice(start, start + base + (1 if pi < extra else 0))


def per_process_seed(seed: int, process_index: Optional[int] = None) -> int:
    """Independent per-process sampler stream: fold the process index into the
    base seed.  Large odd stride so nearby base seeds don't collide across
    processes (same role as DistributedSampler's epoch*rank reseed)."""
    pi = jax.process_index() if process_index is None else process_index
    return (int(seed) + pi * 0x9E3779B1) % (2**31 - 1)


def shard_batch_global(mesh: Mesh, batch: Any, axis: str = DATA_AXIS) -> Any:
    """Assemble a batch pytree of HOST-LOCAL numpy shards into GLOBAL
    jax.Arrays with dim 0 sharded over ``axis``.

    Every process passes its own slice (local_batch_size rows); the result on
    each leaf has global shape ``(local * process_count, ...)``.  On a single
    process this is exactly ``parallel.sharding.shard_batch``."""

    def _put(x):
        sharding = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(_put, batch)


def is_coordinator() -> bool:
    """True on the process that should write checkpoints / logs (index 0)."""
    return jax.process_index() == 0


def add_distributed_args(p) -> None:
    """Shared trainer CLI flags (reference train_diffusion.py:57-83 exposed
    world_size/rank through mp.spawn; here one flag set serves every trainer)."""
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize via the "
                        "launcher environment (TPU pod runtime/SLURM); the "
                        "mesh then spans ALL hosts' devices and each process "
                        "loads only its 1/process_count slice of the batch")
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (explicit bootstrap when no "
                        "launcher environment is present)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def initialize_from_args(args) -> bool:
    """Bootstrap from the trainer CLI flags; returns True when multi-process.
    Call before any device query."""
    if getattr(args, "coordinator_address", None):
        return initialize(args.coordinator_address, args.num_processes, args.process_id)
    if getattr(args, "distributed", False):
        return initialize()
    return False
