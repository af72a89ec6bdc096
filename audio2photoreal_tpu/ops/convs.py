"""1-D convolution helpers in B,T,C layout.

The reference's causal dilated conv stacks (VQ codec encoder/decoder
model/vqvae.py:395-465, pose post-net model/diffusion.py:153,214-224, AudioTcn
model/modules/audio_encoder.py:78+) are all built from left-padded dilated
Conv1d.  Here they are `lax.conv_general_dilated` with NWC/IOW-free dimension
numbers so XLA maps them onto the MXU as batched matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

def conv1d(
    x: jnp.ndarray,  # [B, T, Cin]
    kernel: jnp.ndarray,  # [K, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: str | tuple = "SAME",
) -> jnp.ndarray:
    if isinstance(padding, str):
        pad = padding
    else:
        pad = [tuple(padding)]
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    if bias is not None:
        out = out + bias
    return out


def causal_conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    dilation: int = 1,
) -> jnp.ndarray:
    """Left-padded conv: output[t] sees inputs ≤ t only."""
    k = kernel.shape[0]
    left = (k - 1) * dilation
    return conv1d(x, kernel, bias, dilation=dilation, padding=(left, 0))


def valid_conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
) -> jnp.ndarray:
    """No padding — used by the wav2vec feature extractor whose valid convs
    produce the reference's 1998-token embeddings for 20 s of 16 kHz audio
    (model/diffusion.py:136-137)."""
    return conv1d(x, kernel, bias, stride=stride, padding=(0, 0))
