"""Frozen audio→lip-vertex regressor.

Reference: Audio2LipRegressionTransformer (model/diffusion.py:37-79) — a
wav2vec_large encoder feeding a 2-enc / 4-dec RegressionTransformer
(model/modules/transformer_modules.py:560-628) whose decoder queries are a
zero sequence, projected to 338·3 lip vertex offsets.  Used as extra face
conditioning from a frozen checkpoint (assets/iter-0200000.pt,
diffusion.py:273-280).

Positional encoding: RegressionTransformer uses transformer_modules.py's OWN
``PositionalEncoding`` (:281-302) — the standard batch-first per-position
sin/cos added to both the zero decoder queries and the wav2vec memory (NOT
model/utils.py's off-by-axis variant, which this model never touches).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from audio2photoreal_tpu.models.audio_encoder import Wav2VecEncoder
from audio2photoreal_tpu.models.blocks import FeedForward, MultiHeadAttention
from audio2photoreal_tpu.ops.embeddings import absolute_pos_encoding


class _EncLayer(nn.Module):
    """TransformerEncoderLayer (transformer_modules.py:450-472): pre-norm
    self-attn + pre-norm ReLU feedforward (d_feedforward=1024)."""

    dim: int
    heads: int
    ff_size: int = 1024

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        h = MultiHeadAttention(self.dim, self.heads, name="self_attn")(h, h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = FeedForward(self.dim, self.ff_size, activation=nn.relu, name="ff")(
            h, deterministic
        )
        return x + h


class _DecLayer(nn.Module):
    """TransformerDecoderLayer (transformer_modules.py:475-511)."""

    dim: int
    heads: int
    ff_size: int = 1024

    @nn.compact
    def __call__(self, x, mem, deterministic=True):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        h = MultiHeadAttention(self.dim, self.heads, name="self_attn")(h, h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = MultiHeadAttention(self.dim, self.heads, name="cross_attn")(h, mem, mem)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        h = FeedForward(self.dim, self.ff_size, activation=nn.relu, name="ff")(
            h, deterministic
        )
        return x + h


class LipRegressor(nn.Module):
    n_vertices: int = 338
    dim: int = 512
    heads: int = 4
    enc_layers: int = 2
    dec_layers: int = 4
    ff_size: int = 1024

    @nn.compact
    def __call__(
        self,
        audio_frames: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """[B, T, 1600] mono 48 kHz frames → [B, T, 338, 3] lip vertices."""
        B, T, _ = audio_frames.shape
        cond = Wav2VecEncoder(name="audio_encoder")(audio_frames)  # [B, Tw, 512]
        mem = cond + absolute_pos_encoding(cond.shape[1], self.dim)[None]
        for i in range(self.enc_layers):
            mem = _EncLayer(self.dim, self.heads, self.ff_size, name=f"enc_{i}")(
                mem, deterministic
            )
        # zero decoder queries + standard positions (transformer_modules.py
        # :595-599 — x starts as zeros, PE added per position)
        x = jnp.broadcast_to(absolute_pos_encoding(T, self.dim)[None], (B, T, self.dim))
        for i in range(self.dec_layers):
            x = _DecLayer(self.dim, self.heads, self.ff_size, name=f"dec_{i}")(
                x, mem, deterministic
            )
        out = nn.Dense(self.n_vertices * 3, name="project_output")(x)
        return out.reshape(B, T, self.n_vertices, 3)
