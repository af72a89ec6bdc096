"""Transformer building blocks shared by the denoiser and the guide LM.

Re-designs of model/modules/transformer_modules.py (reference):
- ``FiLMDecoderLayer`` ← FiLMTransformerDecoderLayer (:127-268): pre-norm,
  each sublayer output gated by FiLM(t) before the residual add.
- ``RotaryEncoderLayer`` ← TransformerEncoderLayerRotary (:36-103).
- FiLM generator ← DenseFiLM/featurewise_affine (:105-125).

Rotary compatibility note: the reference rotates Q=K on the FULL d_model
BEFORE the q/k projections (transformer_modules.py:88,238,252-253) — not
per-head after the split.  That choice is load-bearing for torch-checkpoint
parity, so it is the default here (``rotary_mode="pre_proj"``); the idiomatic
per-head application is available as ``rotary_mode="per_head"`` for models
trained in this framework.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

import jax

from audio2photoreal_tpu.ops.attention import dot_product_attention
from audio2photoreal_tpu.ops.rotary import RotaryTable, apply_rotary


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """x · tanh(softplus(x)) — torch.nn.Mish equivalent."""
    return x * jnp.tanh(jax.nn.softplus(x))


class DenseFiLM(nn.Module):
    """t-vector [B, D] → (scale, shift) each [B, 1, D]."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray):
        h = nn.Dense(self.dim * 2, dtype=self.dtype, name="proj")(mish(t))
        scale, shift = jnp.split(h[:, None, :], 2, axis=-1)
        return scale, shift


def featurewise_affine(x: jnp.ndarray, scale_shift) -> jnp.ndarray:
    scale, shift = scale_shift
    return (scale + 1.0) * x + shift


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible attention (separate q/kv inputs,
    packed-head projections convertible from in_proj_weight)."""

    dim: int
    heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q_in: jnp.ndarray,  # [B, Tq, D]
        k_in: jnp.ndarray,  # [B, Tk, D]
        v_in: jnp.ndarray,  # [B, Tk, D]
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, Tq, D = q_in.shape
        Dh = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(q_in)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(k_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(v_in)

        def split(x):
            return x.reshape(B, -1, self.heads, Dh).transpose(0, 2, 1, 3)

        rng = self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        out = dot_product_attention(
            split(q), split(k), split(v), bias,
            dropout_rate=self.dropout, dropout_rng=rng, deterministic=deterministic,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


def exact_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based GELU — matches torch.nn.functional.gelu's default (the
    reference's activation, model/diffusion.py:93)."""
    return nn.gelu(x, approximate=False)


class FeedForward(nn.Module):
    dim: int
    hidden: int
    dropout: float = 0.1
    activation: Callable = exact_gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="linear1")(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)
        return h


def _maybe_rotate(x: jnp.ndarray, rotary: Optional[RotaryTable], offset=0) -> jnp.ndarray:
    return apply_rotary(x, rotary, offset) if rotary is not None else x


class FiLMDecoderLayer(nn.Module):
    """self-attn→FiLM → cross-attn(audio)→FiLM → [cross-attn₂(guide)→FiLM] →
    FF→FiLM, all pre-norm with residuals."""

    dim: int
    heads: int
    ff_size: int
    dropout: float = 0.1
    use_cm: bool = False  # second cross-attention memory (pose keyframes)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        memory: jnp.ndarray,  # [B, Tm, D]
        t: jnp.ndarray,  # [B, D] FiLM conditioning vector
        *,
        memory2: Optional[jnp.ndarray] = None,
        self_bias: Optional[jnp.ndarray] = None,
        rotary: Optional[RotaryTable] = None,
        x_offset=0,  # rotary position offset of x (KV-cache decode)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        drop = lambda h: nn.Dropout(self.dropout, name=None)(h, deterministic=deterministic)

        # self-attention (Q=K rotated pre-projection, V raw)
        h = nn.LayerNorm(name="norm1", dtype=self.dtype)(x)
        qk = _maybe_rotate(h, rotary, x_offset)
        h = MultiHeadAttention(self.dim, self.heads, self.dropout, self.dtype, name="self_attn")(
            qk, qk, h, self_bias, deterministic
        )
        h = drop(h)
        x = x + featurewise_affine(h, DenseFiLM(self.dim, self.dtype, name="film1")(t))

        # cross-attention to audio/cond tokens
        h = nn.LayerNorm(name="norm2", dtype=self.dtype)(x)
        q = _maybe_rotate(h, rotary, x_offset)
        k = _maybe_rotate(memory, rotary)
        h = MultiHeadAttention(self.dim, self.heads, self.dropout, self.dtype, name="cross_attn")(
            q, k, memory, None, deterministic
        )
        h = drop(h)
        x = x + featurewise_affine(h, DenseFiLM(self.dim, self.dtype, name="film2")(t))

        # optional second cross-attention (guide keyframe tokens)
        if self.use_cm:
            h = nn.LayerNorm(name="norm2a", dtype=self.dtype)(x)
            q = _maybe_rotate(h, rotary, x_offset)
            assert memory2 is not None, "use_cm layer requires memory2"
            k = _maybe_rotate(memory2, rotary)
            h = MultiHeadAttention(
                self.dim, self.heads, self.dropout, self.dtype, name="cross_attn2"
            )(q, k, memory2, None, deterministic)
            h = drop(h)
            x = x + featurewise_affine(h, DenseFiLM(self.dim, self.dtype, name="film2a")(t))

        # feedforward
        h = nn.LayerNorm(name="norm3", dtype=self.dtype)(x)
        h = FeedForward(self.dim, self.ff_size, self.dropout, dtype=self.dtype, name="ff")(
            h, deterministic
        )
        h = drop(h)
        x = x + featurewise_affine(h, DenseFiLM(self.dim, self.dtype, name="film3")(t))
        return x


class RotaryEncoderLayer(nn.Module):
    """Pre-norm encoder layer with the same pre-projection rotary trick
    (reference: TransformerEncoderLayerRotary)."""

    dim: int
    heads: int
    ff_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        bias: Optional[jnp.ndarray] = None,
        rotary: Optional[RotaryTable] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = nn.LayerNorm(name="norm1", dtype=self.dtype)(x)
        qk = _maybe_rotate(h, rotary)
        h = MultiHeadAttention(self.dim, self.heads, self.dropout, self.dtype, name="self_attn")(
            qk, qk, h, bias, deterministic
        )
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(name="norm2", dtype=self.dtype)(x)
        h = FeedForward(self.dim, self.ff_size, self.dropout, dtype=self.dtype, name="ff")(
            h, deterministic
        )
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h
