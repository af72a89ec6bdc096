"""Positional / timestep embeddings.

Reference equivalents: diffusion/nn.py:124 (timestep_embedding),
model/utils.py:42-81 (PositionalEncoding, SinusoidalPosEmb).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10_000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [B] → [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def sinusoidal_pos_emb(positions: jnp.ndarray, dim: int, base: float = 10_000.0) -> jnp.ndarray:
    """Interleaved sin/cos over positions, [...,] → [..., dim]
    (model/utils.py:67-81 SinusoidalPosEmb)."""
    half = dim // 2
    scale = math.log(base) / max(half - 1, 1)
    freqs = jnp.exp(-scale * jnp.arange(half, dtype=jnp.float32))
    args = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def absolute_pos_encoding(seq_len: int, dim: int, base: float = 10_000.0) -> jnp.ndarray:
    """[T, dim] table (model/utils.py:42-65 PositionalEncoding, batch_first)."""
    pos = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(base) / dim))
    pe = jnp.zeros((seq_len, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    n_cos = dim // 2
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div[:n_cos]))
    return pe
