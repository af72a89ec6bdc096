"""NamedSharding helpers.

Replaces the reference's DDP + broadcast/all_reduce utility belt
(reference: utils/misc.py:67-135) with sharding annotations: XLA inserts the
gradient psum when the batch axis is sharded and the params are replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio2photoreal_tpu.parallel.mesh import DATA_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch: Any, axis: str = DATA_AXIS) -> Any:
    """Device-put a pytree of host arrays with dim-0 sharded over the mesh."""

    def _put(x):
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))

    return jax.tree_util.tree_map(_put, batch)


def with_shardings(fn, mesh: Mesh, in_specs, out_specs, **jit_kwargs):
    """jit with NamedSharding in/out constraints from PartitionSpecs."""

    def _n(spec):
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s),
            spec,
            is_leaf=lambda s: isinstance(s, P),
        )

    return jax.jit(fn, in_shardings=_n(in_specs), out_shardings=_n(out_specs), **jit_kwargs)
