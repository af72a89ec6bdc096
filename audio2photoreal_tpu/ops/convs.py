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


def strided_conv_as_matmul(
    x: jnp.ndarray,  # [B, T, Cin]
    kernel: jnp.ndarray,  # [K, Cin, Cout] with K % stride == 0
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int,
) -> jnp.ndarray:
    """Valid strided conv re-expressed as window-gather + ONE matmul.

    XLA:TPU tiles very long 1-D convolutions poorly (measured ~0.1% MXU
    utilization on the wav2vec extractor); when K is a multiple of the
    stride, the conv is exactly: block the signal into stride-sized frames,
    concatenate K/stride consecutive frames per output step, and matmul with
    the [K·Cin, Cout] kernel — a shape the MXU eats. Numerically identical
    to ``valid_conv1d``.
    """
    K, Cin, Cout = kernel.shape
    assert K % stride == 0, (K, stride)
    r = K // stride  # stride-frames per window
    B, T, _ = x.shape
    n_blocks = T // stride
    xb = x[:, : n_blocks * stride].reshape(B, n_blocks, stride * Cin)
    n_out = n_blocks - r + 1
    # y[t] = Σ_i blocks[t+i] @ W_i — r sliced matmuls instead of one matmul
    # over a materialized [B, n_out, K·Cin] window tensor (which costs
    # r× the input in HBM and OOMs large training batches)
    w = kernel.reshape(r, stride * Cin, Cout)
    out = jnp.einsum(
        "btk,ko->bto", xb[:, :n_out], w[0], preferred_element_type=jnp.float32
    )
    for i in range(1, r):
        out = out + jnp.einsum(
            "btk,ko->bto", xb[:, i : i + n_out], w[i], preferred_element_type=jnp.float32
        )
    # valid-conv output length: (T − K)//stride + 1 == n_out always (K = r·s)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
