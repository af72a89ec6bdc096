"""Equalized-learning-rate layers + antialiased downsampling + ConcatPyramid.

Ports of the remaining ca_body layer family (visualize/ca_body/nn/layers.py:
``LinearELR`` :606-647, ``Conv2dELR`` :649-770, ``ConcatPyramid`` :771-855,
``Downsample`` :873-940 — the StyleGAN-style runtime weight scaling
w·gain/√fan_in·lr_mul and the blur-pool from "Making Convolutional Networks
Shift-Invariant Again").  The shipped avatar checkpoint doesn't exercise
these, but other ca_body configs do; they complete the convertible layer
surface.  NHWC activations, torch-layout-convertible parameters."""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel(ksize: int, std: Optional[float] = None) -> np.ndarray:
    """2-D Gaussian blur kernel (layers.py:22-47: default std makes the
    kernel edge worth 5% of the center)."""
    assert ksize % 2 == 1
    radius = ksize // 2
    if std is None:
        std = float(np.sqrt(-(radius**2) / (2 * np.log(0.05))))
    x = np.linspace(-radius, radius, ksize)
    g = np.exp(-(x**2) / (2 * std**2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


class LinearELR(nn.Module):
    """weight·(gain/√in·lr_mul), bias·bias_lr_mul (layers.py:606-647).
    Param layout: weight [in, out] (torch's [out, in] transposed)."""

    features: int
    use_bias: bool = True
    gain: Optional[float] = None
    lr_mul: float = 1.0
    bias_lr_mul: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        gain = math.sqrt(2.0) if self.gain is None else self.gain
        std = gain / math.sqrt(in_f) * self.lr_mul
        w = self.param(
            "weight", nn.initializers.normal(1.0 / self.lr_mul), (in_f, self.features)
        )
        out = x @ (w * std)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b * (self.lr_mul if self.bias_lr_mul is None else self.bias_lr_mul)
        return out


class Conv2dELR(nn.Module):
    """ELR conv / transpose-conv with optional untied bias and fused 2×2 box
    filter (layers.py:649-770).  Param layouts mirror the torch tensors:
    forward [kh, kw, Cin/g, Cout]; transpose [kh, kw, Cout/g, Cin]."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    groups: int = 1
    use_bias: bool = True
    untied: bool = False
    height: int = 1
    width: int = 1
    gain: Optional[float] = None
    transpose: bool = False
    fuse_box_filter: bool = False
    lr_mul: float = 1.0
    bias_lr_mul: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.kernel_size
        gain = math.sqrt(2.0) if self.gain is None else self.gain
        fan_in = k * k * cin // self.groups
        std = gain / math.sqrt(fan_in) * self.lr_mul
        init = nn.initializers.normal(1.0 / self.lr_mul)
        blr = self.lr_mul if self.bias_lr_mul is None else self.bias_lr_mul

        if self.transpose:
            w = self.param("weight", init, (k, k, self.features // self.groups, cin))
            if self.fuse_box_filter:
                wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
                w = wp[1:, 1:] + wp[:-1, 1:] + wp[1:, :-1] + wp[:-1, :-1]
                k_eff = k + 1
            else:
                k_eff = k
            # torch conv_transpose2d: out = (H−1)s − 2p + k + output_padding
            w_flip = jnp.flip(w * std, axis=(0, 1)).transpose(0, 1, 3, 2)  # [k,k,Cin,Cout/g]
            pad_lo = k_eff - 1 - self.padding
            pad_hi = k_eff - 1 - self.padding + self.output_padding
            out = jax.lax.conv_general_dilated(
                x, w_flip,
                window_strides=(1, 1),
                padding=[(pad_lo, pad_hi)] * 2,
                lhs_dilation=(self.stride, self.stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        else:
            w = self.param("weight", init, (k, k, cin // self.groups, self.features))
            if self.fuse_box_filter:
                wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
                w = (wp[1:, 1:] + wp[:-1, 1:] + wp[1:, :-1] + wp[:-1, :-1]) * 0.25
            out = jax.lax.conv_general_dilated(
                x, w * std,
                window_strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            if self.untied:
                b = self.param(
                    "bias", nn.initializers.zeros, (self.height, self.width, self.features)
                )
                out = out + (b * blr)[None]
            else:
                b = self.param("bias", nn.initializers.zeros, (self.features,))
                out = out + b * blr
        return out


def blur_downsample(
    x: jnp.ndarray,  # [B, H, W, C]
    filt_size: int = 3,
    stride: int = 2,
    pad_type: str = "reflect",
    pad_off: int = 0,
) -> jnp.ndarray:
    """Antialiased downsampling (blur-pool; layers.py:873-940)."""
    C = x.shape[-1]
    lo = (filt_size - 1) // 2 + pad_off
    hi = -(-(filt_size - 1) // 2) + pad_off
    mode = {"reflect": "reflect", "refl": "reflect", "replicate": "edge",
            "repl": "edge", "zero": "constant"}[pad_type]
    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)), mode=mode)
    if filt_size == 1:
        return xp[:, ::stride, ::stride]
    a = np.asarray([math.comb(filt_size - 1, i) for i in range(filt_size)], np.float32)
    f = np.outer(a, a)
    f = (f / f.sum()).astype(np.float32)
    kern = jnp.asarray(np.tile(f[:, :, None, None], (1, 1, 1, C)))
    return jax.lax.conv_general_dilated(
        xp, kern,
        window_strides=(stride, stride),
        padding=[(0, 0)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def concat_pyramid(
    layers: Sequence,  # flax modules (already bound) or callables
    x: jnp.ndarray,
    y: jnp.ndarray,
    every_other: bool = True,
    ksize: int = 7,
    kstd: Optional[float] = None,
    transposed: bool = False,
) -> jnp.ndarray:
    """ConcatPyramid (layers.py:771-855): run an up/down conv branch on
    ``x`` while concatenating a Gaussian pyramid of ``y`` (channels-last) at
    every conv layer."""
    C = y.shape[-1]
    kern = jnp.asarray(np.tile(gaussian_kernel(ksize, kstd)[:, :, None, None], (1, 1, 1, C)))

    def blur_half(img):
        b = jax.lax.conv_general_dilated(
            img, kern,
            window_strides=(1, 1),
            padding=[(ksize // 2, ksize // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
        return b[:, ::2, ::2]

    levels = -(-len(layers) // 2) if every_other else len(layers)
    pyramid = [blur_half(y) if transposed else y]
    for _ in range(levels - 1):
        pyramid.insert(0, blur_half(pyramid[0]))

    out = x
    for i, layer in enumerate(layers):
        if (i % 2) == 0 or not every_other:
            idx = i // 2 if every_other else i
            out = jnp.concatenate([out, pyramid[idx]], axis=-1)
        out = layer(out)
    return out
