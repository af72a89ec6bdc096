"""Color pipeline: linear capture space ↔ display sRGB + image utilities.

Port of visualize/ca_body/utils/image.py: the inference color path
(``linear2srgb`` :23-46, ``linear2color_corr`` :48-91, ``linear2displayBatch``
:93-132) plus the computational helpers (``linear2color_corr_inv`` :109-126,
``srgb2linear`` :288-309, ``mapped2linear``/``mapped2srgb`` :134-286,
``scale_diff_image`` :311-318, ``dilate``/``erode`` morphology :379-409,
``smoothstep``/``smootherstep`` :411-419).  The remaining image.py functions
are OpenCV/matplotlib debug visualization (tensor2rgbjet, make_image_grid,
draw_keypoints, …) with no load-bearing role in training or inference —
intentionally not ported.
"""

from __future__ import annotations

import jax
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


def srgb2linear(img: jnp.ndarray, gamma: float = 2.4) -> jnp.ndarray:
    """Inverse sRGB transfer (image.py:288-309)."""
    linear_part = img / 12.92
    exp_part = jnp.power((jnp.maximum(img, 0.04045) + 0.055) / 1.055, gamma)
    return jnp.where(img <= 0.04045, linear_part, exp_part)


def linear2color_corr_inv(img: jnp.ndarray, dim: int = -1) -> jnp.ndarray:
    """Inverse of linear2color_corr (image.py:109-126)."""
    gamma = 2.0
    black = 3.0 / 255.0
    if dim == -1:
        dim = img.ndim - 1
    shape = [1] * img.ndim
    shape[dim] = 3
    scale = jnp.array([1.4, 1.1, 1.6]).reshape(shape)
    img = jnp.power(img + 15.0 / 255.0, gamma) / (0.95 / (1 - black)) + black
    return jnp.clip(img / (scale / 1.1), 0.0, 1.0)


def mapped2linear(
    img: jnp.ndarray,
    dim: int = -1,
    ccm=((1, 0, 0), (0, 1, 0), (0, 0, 1)),
    dc_offset=(0, 0, 0),
    gamma: float = 1.0,
) -> jnp.ndarray:
    """Characterized camera color space → linear RGB (image.py:134-240):
    subtract the black level, decode gamma, apply the 3×3 color-correction
    matrix; saturated input pixels clamp to 1.  Floats in [0, 1] or integers
    in [0, 255] accepted; returns float in [0, 1]."""
    if dim == -1:
        dim = img.ndim - 1
    eps = 1e-7
    if jnp.issubdtype(img.dtype, jnp.floating):
        saturated = img > (1.0 - eps)
        imgf = img.astype(jnp.float32)
    else:
        saturated = img == 255
        imgf = img.astype(jnp.float32) / 255.0
    shape = [1] * img.ndim
    shape[dim] = 3
    dc = jnp.asarray(dc_offset, jnp.float32).reshape(shape)
    img_linear = jnp.power(jnp.clip(imgf - dc, eps, None), 1.0 / gamma)
    ccm_m = jnp.asarray(ccm, jnp.float32)
    img_corr = jnp.clip(
        jnp.moveaxis(
            jnp.tensordot(ccm_m, jnp.moveaxis(img_linear, dim, 0), axes=([1], [0])),
            0, dim,
        ),
        0.0, 1.0,
    )
    return jnp.where(saturated, 1.0, img_corr)


def mapped2srgb(img: jnp.ndarray, dim: int = -1, ccm=((1, 0, 0), (0, 1, 0), (0, 0, 1)),
                dc_offset=(0, 0, 0), gamma: float = 1.0) -> jnp.ndarray:
    """Camera space → sRGB (image.py:242-286)."""
    return linear2srgb(mapped2linear(img, dim, ccm, dc_offset, gamma))


def scale_diff_image(diff_img: jnp.ndarray) -> jnp.ndarray:
    """Difference image remap [−max, max] → [0, range] (image.py:311-318)."""
    mval = jnp.abs(diff_img).max()
    is255 = mval > 1
    half = jnp.where(is255, 128.0, 0.5)
    top = jnp.where(is255, 255.0, 1.0)
    return jnp.clip(half * (diff_img / mval) + half, 0.0, top)


def dilate(x: jnp.ndarray, ks: int) -> jnp.ndarray:
    """Binary dilation with a ks×ks box (image.py:379-394).  [B, H, W] or
    [B, H, W, 1], any bool/int/float dtype."""
    assert ks % 2 == 1
    orig_dtype = x.dtype
    squeeze = x.ndim == 3
    xf = (x[..., None] if squeeze else x).astype(jnp.float32)
    w = jnp.ones((ks, ks, 1, 1), jnp.float32)
    out = jax.lax.conv_general_dilated(
        xf, w, (1, 1), [(ks // 2, ks // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out > 0
    if squeeze:
        out = out[..., 0]
    return out.astype(orig_dtype)


def erode(x: jnp.ndarray, ks: int) -> jnp.ndarray:
    """Binary erosion via dilation of the complement (image.py:397-408)."""
    if x.dtype == jnp.bool_:
        return ~dilate(~x, ks)
    return (1 - dilate(1 - x, ks)).astype(x.dtype)


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def smootherstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return (t**3) * (t * (t * 6 - 15) + 10)


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
