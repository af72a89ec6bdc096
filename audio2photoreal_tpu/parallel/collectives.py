"""Thin wrappers over XLA collectives used inside shard_map'd code.

Reference equivalents: ``broadcast_tensors``/``all_reduce`` (utils/misc.py:67-135),
VQ codebook sync (model/vqvae.py:148-167), loss-aware sampler all_gather
(diffusion/resample.py:97-118).  Every wrapper is a no-op when the named axis
is absent, so the same model code runs un-meshed in unit tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _has_axis(axis: str) -> bool:
    try:
        jax.lax.axis_index(axis)
        return True
    except NameError:
        return False


def pmean(x, axis: str):
    return jax.lax.pmean(x, axis) if _has_axis(axis) else x


def psum(x, axis: str):
    return jax.lax.psum(x, axis) if _has_axis(axis) else x


def all_gather(x, axis: str, tiled: bool = False):
    if _has_axis(axis):
        return jax.lax.all_gather(x, axis, tiled=tiled)
    return x if tiled else jnp.expand_dims(x, 0)
