"""Rotary position embeddings.

Reference: model/modules/rotary_embedding_torch.py:84-138 (vendored
rotary-embedding-torch).  The reference applies rotation on the full d_model
BEFORE the head split (transformer_modules.py:88,238,252-253) — unusual but
load-bearing for checkpoint parity, so both placements are supported:
``apply_rotary`` on any trailing dim; models choose pre-split ("compat") or
per-head ("proper").  Tables are precomputed once per max length — no
dynamic caching (XLA wants static shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RotaryTable(NamedTuple):
    cos: jnp.ndarray  # [max_len, dim]
    sin: jnp.ndarray  # [max_len, dim]


def make_rotary_table(dim: int, max_len: int, theta: float = 10_000.0) -> RotaryTable:
    """Pairwise-interleaved frequency table (rotary_embedding_torch.py:84-108,
    'lang' freqs_for)."""
    freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    angles = jnp.einsum("t,f->tf", t, freqs)  # [max_len, dim/2]
    angles = jnp.repeat(angles, 2, axis=-1)  # interleave to [max_len, dim]
    return RotaryTable(cos=jnp.cos(angles), sin=jnp.sin(angles))


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, x2) pairs → (-x2, x1), pairwise interleaved
    (rotary_embedding_torch.py:109-116).

    Implemented as a pair-reshape + stack: identical values to the stride-2
    slice formulation, but stride-2 lane slices (and their scatter VJPs) run
    ~25% slower on TPU at [64, 1000, 512] (tools/probe_rotary_enc.py)."""
    p = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    return jnp.stack([-p[..., 1], p[..., 0]], axis=-1).reshape(x.shape)


def apply_rotary(
    x: jnp.ndarray, table: RotaryTable, offset: int | jnp.ndarray = 0
) -> jnp.ndarray:
    """Rotate the last dim of x over its second-to-last (time) dim.

    x: [..., T, D] with D <= table dim.  `offset` supports KV-cache decoding
    (positions offset..offset+T).
    """
    T, D = x.shape[-2], x.shape[-1]
    if isinstance(offset, int) and offset == 0:
        cos = table.cos[:T, :D]
        sin = table.sin[:T, :D]
    else:
        idx = jnp.arange(T) + offset
        cos = table.cos[idx, :D]
        sin = table.sin[idx, :D]
    # tables follow the carrier dtype: f32 tables on a bf16 stream would
    # upcast the whole [B, T, D] rotation to f32 (float promotion) — the
    # projections cast back anyway, so only bf16-rounding-level deviation
    return x * cos.astype(x.dtype) + _rotate_half(x) * sin.astype(x.dtype)
