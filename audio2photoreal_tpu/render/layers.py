"""Weight-normalized conv/linear layers, NHWC.

JAX equivalents of the reference's layer family
(visualize/ca_body/nn/layers.py): ``LinearWN`` (:422), ``Conv2dWN`` /
``Conv2dWNUB`` (weight-norm + UNTIED per-pixel bias, :126-290,422-435) and
``ConvTranspose2dWNUB`` (:292-420).  Parameters are kept as (v, g) pairs so
torch checkpoints (weight_v/weight_g) convert 1:1; weight norm is computed at
call time exactly like torch's.

Layout: activations NHWC (TPU native), kernels [Kh, Kw, Cin, Cout]; untied
biases [H, W, Cout].  ConvTranspose matches torch semantics
(out = (H−1)·s − 2p + k) via input dilation with a flipped kernel.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Renderer-wide compute dtype (params stay f32; weight-norm is computed in
# f32 then cast).  Set via `render_compute_dtype(jnp.bfloat16)` around the
# model apply — bf16 roughly doubles the conv decoders' MXU throughput.
_COMPUTE_DTYPE = [jnp.float32]


@contextlib.contextmanager
def render_compute_dtype(dtype):
    _COMPUTE_DTYPE.append(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE.pop()


def compute_dtype():
    return _COMPUTE_DTYPE[-1]


def _wn_kernel(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """w[o] = g[o] · v[o] / ‖v‖_F — per-out-channel g with a GLOBAL Frobenius
    norm, matching the reference's ``weight_norm_wrapper(..., g_dim=0,
    v_dim=None)`` (ca_body/nn/layers.py:422-427: v_dim None ⇒
    ``norm_except_dim(v, 2, -1)`` = the norm of the whole tensor)."""
    norm = jnp.sqrt((v**2).sum() + 1e-12)
    return (v * (g.reshape(1, 1, 1, -1) / norm)).astype(compute_dtype())


class LinearWN(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        v = self.param("v", nn.initializers.lecun_normal(), (in_f, self.features))
        g = self.param("g", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        # global Frobenius norm (reference LinearWN: g_dim=0, v_dim=None)
        norm = jnp.sqrt((v**2).sum() + 1e-12)
        cd = compute_dtype()
        w = (v * (g[None] / norm)).astype(cd)
        return x.astype(cd) @ w + b.astype(cd)


class Conv2dWN(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.kernel_size
        v = self.param(
            "v", nn.initializers.lecun_normal(), (k, k, cin // self.groups, self.features)
        )
        g = self.param("g", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        w = _wn_kernel(v, g)
        out = jax.lax.conv_general_dilated(
            x.astype(w.dtype), w,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        return out + b.astype(w.dtype)


class Conv2dWNUB(nn.Module):
    """Weight-norm conv with an untied (per-pixel) bias map — the reference's
    workhorse layer (layers.py:243-290,422-427)."""

    features: int
    height: int
    width: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.kernel_size
        v = self.param(
            "v", nn.initializers.lecun_normal(), (k, k, cin // self.groups, self.features)
        )
        g = self.param("g", nn.initializers.ones, (self.features,))
        bias = self.param(
            "bias", nn.initializers.zeros, (self.height, self.width, self.features)
        )
        w = _wn_kernel(v, g)
        out = jax.lax.conv_general_dilated(
            x.astype(w.dtype), w,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        return out + bias[None].astype(w.dtype)


def _conv_transpose(x, w, stride: int, padding: int):
    """torch ConvTranspose2d equivalent: input dilation + flipped kernel.
    w: [Kh, Kw, Cout, Cin] (note transposed channel order)."""
    k = w.shape[0]
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # → [Kh, Kw, Cin, Cout]
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x, w_flip,
        window_strides=(1, 1),
        padding=[(pad, pad)] * 2,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ConvTranspose2dWNUB(nn.Module):
    features: int
    height: int
    width: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.kernel_size
        # stored [Kh, Kw, Cout, Cin] to mirror torch's [Cin, Cout, Kh, Kw]
        v = self.param("v", nn.initializers.lecun_normal(), (k, k, self.features, cin))
        g = self.param("g", nn.initializers.ones, (self.features,))
        bias = self.param(
            "bias", nn.initializers.zeros, (self.height, self.width, self.features)
        )
        # global norm, per-Cout g (reference ConvTranspose2dWNUB: g_dim=1,
        # v_dim=None — torch weight is [Cin, Cout, kh, kw], g over dim 1)
        norm = jnp.sqrt((v**2).sum() + 1e-12)
        cd = compute_dtype()
        w = (v * (g.reshape(1, 1, -1, 1) / norm)).astype(cd)
        out = _conv_transpose(x.astype(cd), w, self.stride, self.padding)
        return out + bias[None].astype(cd)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """F.interpolate(mode='bilinear') equivalent, NHWC.

    The align_corners=True path (torch UpsamplingBilinear2d semantics, used by
    every UpConvBlockDeep) is written as separable row/column takes + lerp —
    4 contiguous gathers instead of 8 nested fancy-index gathers, which
    dominated the 1024² decoder's runtime."""
    B, H, W, C = x.shape
    Ho, Wo = size
    if align_corners and Ho > 1 and Wo > 1:
        ys = jnp.linspace(0.0, H - 1.0, Ho)
        xs = jnp.linspace(0.0, W - 1.0, Wo)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        wy = (ys - y0).astype(x.dtype)[None, :, None, None]
        wx = (xs - x0).astype(x.dtype)[None, None, :, None]
        # y direction first: [B, Ho, W, C]
        top = jnp.take(x, y0, axis=1)
        bot = jnp.take(x, y1, axis=1)
        xy = top * (1 - wy) + bot * wy
        # then x direction: [B, Ho, Wo, C]
        left = jnp.take(xy, x0, axis=2)
        right = jnp.take(xy, x1, axis=2)
        return left * (1 - wx) + right * wx
    return jax.image.resize(x, (B, Ho, Wo, C), method="bilinear")


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Depth-to-space, NHWC, matching torch.nn.PixelShuffle channel order."""
    B, H, W, C = x.shape
    co = C // (r * r)
    x = x.reshape(B, H, W, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * r, W * r, co)


def tile2d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """[B, F] → [B, size, size, F] (blocks.py:699-712, NHWC)."""
    return jnp.broadcast_to(x[:, None, None, :], (x.shape[0], size, size, x.shape[1]))
