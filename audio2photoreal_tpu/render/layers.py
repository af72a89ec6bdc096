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
import numpy as np

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


def _grouped_conv(x, w, stride: int, padding: int, groups: int) -> jnp.ndarray:
    """Grouped conv as per-group separate convs.  XLA's TPU lowering of
    feature_group_count>1 falls off the MXU fast path for these small group
    counts (the decoder's verts/tex split, groups=2); running the groups as
    independent convs and concatenating is mathematically identical and
    keeps each matmul dense."""
    if groups == 1:
        return jax.lax.conv_general_dilated(
            x, w,
            window_strides=(stride, stride),
            padding=[(padding, padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    cin_g = x.shape[-1] // groups
    cout_g = w.shape[-1] // groups
    outs = []
    for gi in range(groups):
        outs.append(
            jax.lax.conv_general_dilated(
                x[..., gi * cin_g : (gi + 1) * cin_g],
                w[..., gi * cout_g : (gi + 1) * cout_g],
                window_strides=(stride, stride),
                padding=[(padding, padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
    return jnp.concatenate(outs, axis=-1)


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
        out = _grouped_conv(x.astype(w.dtype), w, self.stride, self.padding, self.groups)
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
        out = _grouped_conv(x.astype(w.dtype), w, self.stride, self.padding, self.groups)
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


def _upsample2x_half_pixel(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2× bilinear upsample with half-pixel centers (align_corners=
    False), gather-free: output rows interleave 0.25/0.75 blends of adjacent
    input rows (edge-clamped), same along columns.  This is the
    forward_tex 1024→2048 hot path (mesh_vae_drivable.py:236)."""

    def up_axis(v, axis):
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 0, 1, axis=axis), v], axis=axis
        )  # v[i-1] clamped
        hi = jnp.concatenate(
            [v, jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis], axis=axis)],
            axis=axis,
        )  # v[i+1] clamped
        prev = jax.lax.slice_in_dim(lo, 0, v.shape[axis], axis=axis)
        nxt = jax.lax.slice_in_dim(hi, 1, v.shape[axis] + 1, axis=axis)
        even = 0.25 * prev + 0.75 * v  # sample at i − 0.25
        odd = 0.75 * v + 0.25 * nxt  # sample at i + 0.25
        stacked = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(v.shape)
        new_shape[axis] = v.shape[axis] * 2
        return stacked.reshape(new_shape)

    return up_axis(up_axis(x, 1), 2)


def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix (2 nonzeros per row)."""
    if align_corners and n_out > 1:
        pos = np.linspace(0.0, n_in - 1.0, n_out)
    else:
        pos = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
    i0 = np.clip(np.floor(pos).astype(int), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w = np.clip(pos - i0, 0.0, 1.0)
    R = np.zeros((n_out, n_in), np.float32)
    R[np.arange(n_out), i0] += 1 - w
    R[np.arange(n_out), i1] += w
    return R


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """F.interpolate(mode='bilinear') equivalent, NHWC.

    TPU-native formulation: separable interpolation as two small MATMULS
    against static [n_out, n_in] weight matrices (2 nonzeros per row).  Row
    pass contracts with W·C as the minor dim; the column pass runs in a
    W-minor transposed layout — both MXU-friendly.  Gather/fancy-index
    formulations of the same resize measured 1.5-2× slower on this
    toolchain, and TPU strided slices are pathologically slow.  The 2×
    half-pixel upsample (forward_tex's 1024→2048) uses a gather-free
    interleave instead."""
    B, H, W, C = x.shape
    Ho, Wo = size
    if (Ho, Wo) == (H, W):
        return x
    if not align_corners and Ho == 2 * H and Wo == 2 * W:
        return _upsample2x_half_pixel(x)
    Ry = jnp.asarray(_interp_matrix(H, Ho, align_corners), x.dtype)
    Rx = jnp.asarray(_interp_matrix(W, Wo, align_corners), x.dtype)
    # rows: [Ho,H] × [B,H,(W·C)]
    y = jnp.einsum("oh,bhx->box", Ry, x.reshape(B, H, W * C)).reshape(B, Ho, W, C)
    # cols in W-minor layout: [Wo,W] × [B,Ho,C,W]
    yt = y.transpose(0, 1, 3, 2)
    z = jnp.einsum("ow,bhcw->bhco", Rx, yt)
    return z.transpose(0, 1, 3, 2)


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
