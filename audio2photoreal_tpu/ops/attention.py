"""Attention primitives.

The framework's attention is a plain jnp.einsum softmax attention — at the
reference's sequence lengths (≤600 motion / ≤1998 audio tokens, SURVEY §5.7)
XLA fuses this well onto the MXU and a flash kernel buys little; a blockwise
Pallas path (`ops/pallas/flash.py`) is the long-context growth path.

Masks follow the additive convention: `bias` is added to logits pre-softmax
(−inf = masked).  Helpers build causal and key-padding biases.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative instead of -inf: keeps softmax NaN-free when a
# query row is fully masked (padding rows), matching masked-row semantics


def causal_bias(q_len: int, k_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """[q_len, k_len] lower-triangular additive mask
    (reference: transformer_modules.py:18 generate_causal_mask)."""
    i = jnp.arange(q_len)[:, None]
    j = jnp.arange(k_len)[None, :]
    return jnp.where(j <= i + (k_len - q_len), 0.0, NEG_INF).astype(dtype)


def padding_bias(valid: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Key padding mask [B, K] (1=valid) → additive bias [B, 1, 1, K]."""
    return jnp.where(valid[:, None, None, :] > 0, 0.0, NEG_INF).astype(dtype)


def dot_product_attention(
    q: jnp.ndarray,  # [B, H, Tq, Dh]
    k: jnp.ndarray,  # [B, H, Tk, Dh]
    v: jnp.ndarray,  # [B, H, Tk, Dh]
    bias: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Tq, Tk]
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
