"""Device-mesh construction.

The reference's distributed layer is torch.distributed scaffolding that never
initializes a process group (reference: utils/misc.py:41-48,
train/train_diffusion.py:57-83).  The TPU-native replacement is a single
``jax.sharding.Mesh``: data parallelism is a sharded batch axis with
XLA-inserted psums; model/sequence axes are available for larger models.
Collectives ride ICI within a slice and DCN across slices — that choice is
made purely by the mesh layout, not by any backend plumbing here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

# Canonical axis names used throughout the framework.
DATA_AXIS = "data"  # batch / data parallel
MODEL_AXIS = "model"  # tensor parallel (width)
SEQ_AXIS = "seq"  # sequence parallel (time) — long-context growth path (SURVEY §5.7)


@dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape by axis name; -1 means 'all remaining devices'."""

    shape: Tuple[int, ...] = (-1,)
    axes: Tuple[str, ...] = (DATA_AXIS,)

    def resolve(self, n_devices: int) -> Tuple[int, ...]:
        shape = list(self.shape)
        known = int(np.prod([s for s in shape if s != -1])) if shape else 1
        if -1 in shape:
            if n_devices % max(known, 1) != 0:
                raise ValueError(f"{n_devices} devices not divisible by {known}")
            shape[shape.index(-1)] = n_devices // max(known, 1)
        if int(np.prod(shape)) != n_devices:
            raise ValueError(f"mesh shape {tuple(shape)} != {n_devices} devices")
        return tuple(shape)


def create_mesh(
    spec: MeshSpec = MeshSpec(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, spec.axes)


def local_mesh(axes: Tuple[str, ...] = (DATA_AXIS,)) -> Mesh:
    """Mesh over all local devices on a single axis (or the given axes, with
    all devices on the first)."""
    n = len(jax.devices())
    shape = (n,) + (1,) * (len(axes) - 1)
    return create_mesh(MeshSpec(shape, axes))


def data_mesh(batch_size: int) -> Mesh:
    """Data-parallel mesh sized to the batch: all devices when the batch
    divides evenly, else (single-process only) the largest divisor subset.
    Multi-process meshes must span every process's devices, so there the
    batch is required to divide the global device count."""
    import math

    n_dev = len(jax.devices())
    dp = math.gcd(batch_size, n_dev)
    if dp == n_dev:
        return create_mesh(MeshSpec((n_dev,), (DATA_AXIS,)))
    if jax.process_count() > 1:
        raise ValueError(
            f"global batch {batch_size} must divide {n_dev} devices across "
            f"{jax.process_count()} processes"
        )
    return create_mesh(MeshSpec((dp,), (DATA_AXIS,)), jax.devices()[:dp])
