"""Frozen audio→lip-vertex regressor.

Reference: Audio2LipRegressionTransformer (model/diffusion.py:37-79) — a
wav2vec_large encoder feeding a 2-enc / 4-dec RegressionTransformer
(model/modules/transformer_modules.py:560-628) whose decoder queries are a
zero sequence, projected to 338·3 lip vertex offsets.  Used as extra face
conditioning from a frozen checkpoint (assets/iter-0200000.pt,
diffusion.py:273-280).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from audio2photoreal_tpu.models.audio_encoder import Wav2VecEncoder
from audio2photoreal_tpu.models.blocks import FeedForward, MultiHeadAttention
from audio2photoreal_tpu.ops.embeddings import absolute_pos_encoding


class _EncLayer(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.LayerNorm(name="norm1")(x)
        h = MultiHeadAttention(self.dim, self.heads, name="self_attn")(h, h, h)
        x = x + h
        h = nn.LayerNorm(name="norm2")(x)
        h = FeedForward(self.dim, self.dim * 4, name="ff")(h, deterministic)
        return x + h


class _DecLayer(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, mem, deterministic=True):
        h = nn.LayerNorm(name="norm1")(x)
        h = MultiHeadAttention(self.dim, self.heads, name="self_attn")(h, h, h)
        x = x + h
        h = nn.LayerNorm(name="norm2")(x)
        h = MultiHeadAttention(self.dim, self.heads, name="cross_attn")(h, mem, mem)
        x = x + h
        h = nn.LayerNorm(name="norm3")(x)
        h = FeedForward(self.dim, self.dim * 4, name="ff")(h, deterministic)
        return x + h


class LipRegressor(nn.Module):
    n_vertices: int = 338
    dim: int = 512
    heads: int = 4
    enc_layers: int = 2
    dec_layers: int = 4

    @nn.compact
    def __call__(self, audio_frames: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """[B, T, 1600] mono 48 kHz frames → [B, T, 338, 3] lip vertices."""
        B, T, _ = audio_frames.shape
        cond = Wav2VecEncoder(name="audio_encoder")(audio_frames)  # [B, T, 512]
        pe = absolute_pos_encoding(T, self.dim)[None]
        mem = cond + pe
        for i in range(self.enc_layers):
            mem = _EncLayer(self.dim, self.heads, name=f"enc_{i}")(mem, deterministic)
        x = jnp.broadcast_to(pe, (B, T, self.dim))  # zero queries + positions
        for i in range(self.dec_layers):
            x = _DecLayer(self.dim, self.heads, name=f"dec_{i}")(x, mem, deterministic)
        out = nn.Dense(self.n_vertices * 3, name="project_output")(x)
        return out.reshape(B, T, self.n_vertices, 3)
