"""One-pass texture finalisation for the display render path.

The product pipeline ends every view with a chain of 2048² elementwise
passes: ``tex·std + mean`` → ``·shadow`` (mesh_vae.forward_tex, carrier
bf16) → display transform (render/color.linear2display_batch, f32) →
RGB8 pack (ops/gridsample.pack_rgb8).  XLA fuses parts of it, but the chain
still runs as separate fusions around the bf16→f32 boundary and the int
pack.  This kernel does the WHOLE thing in one VMEM round trip per tile —
HBM sees the raw texture, the shadow, the mean, and the packed int32 out.

Numerics: the pre-display math runs in bf16 exactly like forward_tex (the
carrier dtype), the display curve in f32 exactly like linear2display_batch —
same op order, same dtypes, so the packed bytes match the composed XLA ops
bit-for-bit up to pow()'s ULP, which the round() can turn into a ±1 count on
a tiny fraction of texels (tests/test_render.py pins ≥99.9% exact, ≤1).

Reference being replaced: the reference renders linear and applies
``linear2displayBatch`` per frame on GPU tensors (visualize/render_codes.py:
121-126); the packed display texture is this framework's TPU design (one
int32 gather per pixel, round 2).

STATUS (round 5): built, parity-tested, and benchmarked — standalone it is
14× the composed XLA ops (0.8 vs 11.4 ms/frame @B=16), but wired into the
product render it measured a consistent −1% (2cam 23.27 → 23.03 FPS): in
context XLA already fuses the chain to its floor and overlaps it with the
raster, while this kernel pays planar channel extracts.  Kept UNWIRED as
the definitive measured close of the "fuse the 2048² elementwise tail"
prescription (NOTES_ROUND5.md); the render paths use the XLA chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _srgb255(scaled: jnp.ndarray) -> jnp.ndarray:
    """f32 [0,1] → display [0,255] (render/color.linear2srgb, gamma 2.4)."""
    linear_part = scaled * 12.92
    exp_part = 1.055 * jnp.power(jnp.maximum(scaled, 1e-12), 1.0 / 2.4) - 0.055
    srgb = jnp.where(scaled <= 0.0031308, linear_part, exp_part)
    return jnp.clip(srgb * 255.0, 0.0, 255.0)


def _finalize_kernel(
    r_ref, g_ref, b_ref, sh_ref, mr_ref, mg_ref, mb_ref, out_ref,
    *, std, black, white,
):
    # ALL math in f32: the composed XLA path rounds ×std+mean and ×shadow to
    # the bf16 carrier between ops (quantum ≈2 at texture magnitudes ~255);
    # in VMEM the f32 upcast is free, so the kernel matches the reference's
    # f32 texture math MORE closely than the chain it replaces.
    sh = sh_ref[0].astype(jnp.float32)
    out = None
    for ch_ref, m_ref, shift in ((r_ref, mr_ref, 0), (g_ref, mg_ref, 8), (b_ref, mb_ref, 16)):
        t = ch_ref[0].astype(jnp.float32) * std + m_ref[...].astype(jnp.float32)
        t = t * sh
        scaled = (t / 255.0 - black) / (white - black)
        q = jnp.round(_srgb255(jnp.clip(scaled, 0.0, 1.0))).astype(jnp.int32)
        q = jnp.clip(q, 0, 255)
        out = q if out is None else out | (q << shift)
    out_ref[0] = out


def finalize_display_packed(
    tex: jnp.ndarray,  # [B, H, W, 3] raw texture (pre ×std+mean), carrier dtype
    shadow: jnp.ndarray,  # [B, H, W, 1] seam-resampled shadow, carrier dtype
    mean: jnp.ndarray,  # [H, W, 3] per-person texture mean
    std: float,
    black: float = 5.0 / 255.0,
    white: float = 0.7,
    block_h: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """→ packed display-space RGB8 int32 [B, H, W] in ONE pass."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, H, W, _ = tex.shape
    dt = tex.dtype
    bh = min(block_h, H)
    # channel-planar views: lane dim stays W (2048 = 16×128) per block
    r, g, b = (tex[..., i] for i in range(3))
    sh = shadow[..., 0].astype(dt)
    mr, mg, mb = (mean[..., i].astype(dt) for i in range(3))

    ch_spec = pl.BlockSpec((1, bh, W), lambda i, j: (i, j, 0), memory_space=_VMEM)
    m_spec = pl.BlockSpec((bh, W), lambda i, j: (j, 0), memory_space=_VMEM)
    return pl.pallas_call(
        functools.partial(_finalize_kernel, std=std, black=black, white=white),
        grid=(B, H // bh),
        in_specs=[ch_spec, ch_spec, ch_spec, ch_spec, m_spec, m_spec, m_spec],
        out_specs=ch_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
    )(r, g, b, sh, mr, mg, mb)
