"""Color pipeline: linear capture space → display sRGB.

Port of the functions the render path uses from
visualize/ca_body/utils/image.py: ``linear2srgb`` (:23-46),
``linear2color_corr`` (:48-91), ``linear2displayBatch`` (:93-132).
"""

from __future__ import annotations

import jax.numpy as jnp


def linear2srgb(img: jnp.ndarray, gamma: float = 2.4) -> jnp.ndarray:
    """IEC 61966-2-1 linear → sRGB transfer (image.py:23-46)."""
    linear_part = img * 12.92
    exp_part = 1.055 * jnp.power(jnp.maximum(img, 1e-12), 1.0 / gamma) - 0.055
    return jnp.where(img <= 0.0031308, linear_part, exp_part)


def linear2color_corr(img: jnp.ndarray, dim: int = -1) -> jnp.ndarray:
    """Per-channel gain + gamma + black-level correction the capture stage
    bakes in (image.py:48-91)."""
    if dim == -1:
        dim = img.ndim - 1
    gains = jnp.array([1.2, 1.0, 1.5])
    gamma = 2.0
    black = 3.0 / 255.0
    color_scale = jnp.array([1.4, 1.1, 1.6])
    shape = [1] * img.ndim
    shape[dim] = 3
    g = (gains * color_scale).reshape(shape)
    return jnp.clip(
        (((img * g) ** (1.0 / gamma)) - black) / (1.0 - black), 0.0, 1.0
    )


def linear2display_batch(
    img: jnp.ndarray,  # [B, H, W, 3] linear, 0..255 scale
    black: float = 5.0 / 255.0,
    white: float = 0.7,
) -> jnp.ndarray:
    """The renderer's display transform (image.py:93-132): normalize by
    black/white points then sRGB; returns uint8-ready [0, 255] floats."""
    scaled = (img / 255.0 - black) / (white - black)
    srgb = linear2srgb(jnp.clip(scaled, 0.0, 1.0))
    return jnp.clip(srgb * 255.0, 0.0, 255.0)
