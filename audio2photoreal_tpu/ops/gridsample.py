"""Bilinear grid sampling (torch.nn.functional.grid_sample equivalent).

Used by the renderer's UV machinery: `sample_uv` (ca_body/utils/geom.py:274-302)
and the seam re-sampler (ca_body/utils/seams.py:23-52).  Implemented as a
gather + lerp — XLA lowers the gathers to efficient dynamic-slices; there is
no native grid_sample on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(
    img: jnp.ndarray,  # [B, H, W, C]
    grid: jnp.ndarray,  # [B, Ho, Wo, 2] normalized coords in [-1, 1], (x, y)
    *,
    align_corners: bool = False,
    padding_zero: bool = True,
) -> jnp.ndarray:
    B, H, W, C = img.shape
    x = grid[..., 0]
    y = grid[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (W - 1)
        fy = (y + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((x + 1.0) * W - 1.0) * 0.5
        fy = ((y + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    def gather(xi, yi):
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        out = jnp.take_along_axis(
            img.reshape(B, H * W, C),
            (yi_c * W + xi_c).reshape(B, -1, 1),
            axis=1,
        ).reshape(xi.shape + (C,))
        if padding_zero:
            inside = (
                (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            )[..., None]
            out = jnp.where(inside, out, 0.0)
        return out

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
