"""Typed PRNG-key plumbing.

Replaces the reference's global ``fixseed`` + implicit torch RNG
(reference: utils/misc.py:138) with explicit, splittable JAX keys.
"""

from __future__ import annotations

from typing import Dict, Iterator, Sequence

import jax


def key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def split_named(k: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    keys = jax.random.split(k, len(names))
    return dict(zip(names, keys))


def stream(k: jax.Array) -> Iterator[jax.Array]:
    """Infinite deterministic stream of keys (host-side loops only)."""
    while True:
        k, sub = jax.random.split(k)
        yield sub
