"""Bilinear grid sampling (torch.nn.functional.grid_sample equivalent).

Used by the renderer's UV machinery: `sample_uv` (ca_body/utils/geom.py:274-302)
and the seam re-sampler (ca_body/utils/seams.py:23-52).  Implemented as a
gather + lerp — XLA lowers the gathers to efficient dynamic-slices; there is
no native grid_sample on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_per_frame(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather ``out[b, p] = table[b, idx[b, p]]`` as a
    ``lax.scan`` of per-frame ``jnp.take`` calls.

    XLA:TPU lowers a batched ``take_along_axis`` ~5× slower than a plain
    single-operand row gather (measured 45M vs 213M idx/s at the renderer's
    operating point, tools/probe_gather3.py) — scanning the batch dimension
    and gathering each frame's rows from its own [N, C] table keeps every
    gather on the fast path.  Semantics: indices must already be in-bounds
    (callers clip)."""
    def body(_, ti):
        tab_b, idx_b = ti
        return 0, jnp.take(tab_b, idx_b, axis=0)

    _, out = jax.lax.scan(body, 0, (table, idx))
    return out


def pack_rgb8(tex: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] float in [0, 255] → packed int32 (R | G<<8 | B<<16).

    One int32 per texel keeps the random texture gather to a SINGLE channel
    and 4 bytes — vs 3 channels × 4 bytes for an f32 RGB texture.  TPU
    gathers are the photoreal renderer's wall (~80 ms/frame at 2048²/f32 in
    round 1), so the product path packs the display-space texture once per
    frame (dense, vectorized) and unpacks after the gather."""
    q = jnp.clip(jnp.round(tex), 0.0, 255.0).astype(jnp.int32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)


def unpack_rgb8(packed: jnp.ndarray) -> jnp.ndarray:
    """packed int32 → [..., 3] float in [0, 255]."""
    r = packed & 0xFF
    g = (packed >> 8) & 0xFF
    b = (packed >> 16) & 0xFF
    return jnp.stack([r, g, b], axis=-1).astype(jnp.float32)


def make_quad_texture(img_packed: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] packed int32 → [B, H, W, 4] where entry (y, x) holds the
    2×2 bilinear neighborhood [T(y,x), T(y,x+1), T(y+1,x), T(y+1,x+1)]
    (edge-clamped).  Built with three dense shifted copies — vectorized, one
    pass per frame.  Trades 4× texture memory for gathering ONE contiguous
    16-byte slice per pixel instead of 4 independent scalar gathers: TPU
    gathers are per-index-op bound, so this quarters the texture-sampling
    wall again after RGB8 packing."""
    right = jnp.concatenate([img_packed[:, :, 1:], img_packed[:, :, -1:]], axis=2)
    down = jnp.concatenate([img_packed[:, 1:], img_packed[:, -1:]], axis=1)
    down_right = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    return jnp.stack([img_packed, right, down, down_right], axis=-1)


def grid_sample_bilinear_quad(
    quad: jnp.ndarray,  # [B, H, W, 4] from make_quad_texture
    grid: jnp.ndarray,  # [B, Ho, Wo, 2] normalized coords in [-1, 1], (x, y)
    *,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear sample of a quad-packed RGB8 texture → [B, Ho, Wo, 3] float.
    ONE gather per output pixel (slice size 4×int32).  Border-clamped."""
    B, H, W, _ = quad.shape
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
    xi = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    # weights relative to the CLAMPED base: for fx < 0 this pins wx to 0 and
    # for fx ≥ W−1 the stored +1 neighbor is already the clamped edge texel —
    # together exactly border padding
    wx = jnp.clip(fx - xi, 0.0, 1.0)[..., None]
    wy = jnp.clip(fy - yi, 0.0, 1.0)[..., None]
    flat = quad.reshape(B, H * W, 4)
    idx = (yi * W + xi).reshape(B, -1)
    q = take_per_frame(flat, idx)  # [B, P, 4]
    q = q.reshape(x.shape + (4,))
    v00 = unpack_rgb8(q[..., 0])
    v01 = unpack_rgb8(q[..., 1])
    v10 = unpack_rgb8(q[..., 2])
    v11 = unpack_rgb8(q[..., 3])
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_bilinear_packed(
    img_packed: jnp.ndarray,  # [B, H, W] int32 RGB8-packed
    grid: jnp.ndarray,  # [B, Ho, Wo, 2] normalized coords in [-1, 1], (x, y)
    *,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear sample of a packed-RGB8 texture → [B, Ho, Wo, 3] float.

    4 single-channel int32 gathers (the bilinear corners) instead of 12
    f32-channel gathers; the lerp runs on unpacked floats.  Border-clamped
    (padding_mode='border')."""
    B, H, W = img_packed.shape
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
    flat = img_packed.reshape(B, H * W)

    def gather(xi, yi):
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        p = take_per_frame(flat[..., None], (yi_c * W + xi_c).reshape(B, -1))
        return unpack_rgb8(p.reshape(xi.shape))

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


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
        out = take_per_frame(
            img.reshape(B, H * W, C), (yi_c * W + xi_c).reshape(B, -1)
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
