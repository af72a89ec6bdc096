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


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/2, W/2, 4C], channel layout (ry, rx, c)."""
    B, H, W, C = x.shape
    return (
        x.reshape(B, H // 2, 2, W // 2, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H // 2, W // 2, 4 * C)
    )


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    B, H2, W2, C4 = x.shape
    C = C4 // 4
    return (
        x.reshape(B, H2, W2, 2, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H2 * 2, W2 * 2, C)
    )


def _s2d_conv3x3_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Cin, Cout] → the equivalent [3, 3, 4Cin, 4Cout] kernel in
    space-to-depth coordinates.

    A stride-1 3×3 conv on [H, W, C] equals a 3×3 conv on the s2d tensor
    [H/2, W/2, 4C] with a structured (56% zero) kernel.  Worth 4× the FLOPs:
    C≤32 convs at 1024² are LANE-bound on TPU (channels fill 32/128 vector
    lanes) — the s2d form runs with full lanes and measured ~2× faster."""
    cin, cout = w.shape[2], w.shape[3]
    # index arrays over (q+1, r, d): ky = 2q + r − d + 1
    q = np.arange(3) - 1
    r = np.arange(2)
    d = np.arange(2)
    ky = 2 * q[:, None, None] + r[None, :, None] - d[None, None, :] + 1  # [3,2,2]
    valid = (ky >= 0) & (ky < 3)
    kyc = np.clip(ky, 0, 2)
    # explicit takes build [qy, ry, dy, qx, rx, dx, cin, cout]
    w_y = jnp.take(w, jnp.asarray(kyc.reshape(-1)), axis=0).reshape(3, 2, 2, 3, cin, cout)
    # w_y[qy, ry, dy, kx, cin, cout]; now index kx the same way
    w_yx = jnp.take(w_y, jnp.asarray(kyc.reshape(-1)), axis=3).reshape(
        3, 2, 2, 3, 2, 2, cin, cout
    )
    # w_yx[qy, ry, dy, qx, rx, dx, cin, cout]
    mask = jnp.asarray(
        (valid[:, :, :, None, None, None] & valid[None, None, None, :, :, :]).astype(
            np.float32
        )
    )  # [3,2,2,3,2,2]
    w_yx = w_yx * mask[..., None, None].astype(w.dtype)
    # → [qy, qx, (ry, rx, cin), (dy, dx, cout)]
    w2 = w_yx.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(3, 3, 4 * cin, 4 * cout)
    return w2


def conv3x3_s2d(x_s2d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 pad-1 3×3 conv applied in space-to-depth coordinates.
    x_s2d: [B, H/2, W/2, 4Cin]; w: the ORIGINAL [3, 3, Cin, Cout]."""
    w2 = _s2d_conv3x3_kernel(w)
    return jax.lax.conv_general_dilated(
        x_s2d, w2, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv1x1_s2d(x_s2d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """1×1 conv in s2d coordinates: block-diagonal [4Cin, 4Cout] matmul
    (each spatial phase maps through the same [Cin, Cout])."""
    cin, cout = w.shape[2], w.shape[3]
    blocks = jnp.zeros((4, cin, 4, cout), w.dtype)
    idx = jnp.arange(4)
    blocks = blocks.at[idx, :, idx, :].set(jnp.repeat(w[0, 0][None], 4, axis=0))
    w2 = blocks.reshape(1, 1, 4 * cin, 4 * cout)
    return jax.lax.conv_general_dilated(
        x_s2d, w2, (1, 1), [(0, 0)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _s2d2_conv3x3_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Cin, Cout] → the equivalent [3, 3, 16Cin, 16Cout] kernel two
    space-to-depth levels down (4×4 pixel blocks).

    The level-1 map sends "3×3 stride-1 pad-1 conv on G" to "3×3 stride-1
    pad-1 conv on s2d(G)", so applying it twice composes exactly, and the
    channel layout (r2y, r2x, r1y, r1x, c) matches
    ``space_to_depth(space_to_depth(x))``.  Measured on v5e: the raw 16-ch
    1024² conv is lane-bound at 4.95 ms/frame, level 1 runs 1.53, level 2
    runs ≤1.14 (B=16, bf16) despite the 16× nominal FLOPs — the kernel is
    ~89% zeros but the MXU is otherwise idle.  CAVEAT: in the full decoder
    the extra relayouts break XLA fusion with neighboring resize/seam ops
    and level 2 is a net LOSS (conv_decoder 13.4 → 19.7 ms/frame) — product
    modules default to level 1; this stays as a tested opt-in."""
    return _s2d_conv3x3_kernel(_s2d_conv3x3_kernel(w))


def conv3x3_s2d2(x_s2d2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 pad-1 3×3 conv applied two s2d levels down.
    x_s2d2: [B, H/4, W/4, 16Cin]; w: the ORIGINAL [3, 3, Cin, Cout]."""
    w2 = _s2d2_conv3x3_kernel(w)
    return jax.lax.conv_general_dilated(
        x_s2d2, w2, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv1x1_s2d2(x_s2d2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """1×1 conv two s2d levels down: block-diagonal [16Cin, 16Cout] matmul."""
    cin, cout = w.shape[2], w.shape[3]
    blocks = jnp.zeros((16, cin, 16, cout), w.dtype)
    idx = jnp.arange(16)
    blocks = blocks.at[idx, :, idx, :].set(jnp.repeat(w[0, 0][None], 16, axis=0))
    w2 = blocks.reshape(1, 1, 16 * cin, 16 * cout)
    return jax.lax.conv_general_dilated(
        x_s2d2, w2, (1, 1), [(0, 0)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _s2d_down4x4_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[4, 4, Cin, Cout] stride-2 pad-1 conv → [3, 3, 4Cin, Cout] stride-1
    pad-1 kernel consuming s2d input and emitting the half-res grid directly
    (ky = 2q + r + 1)."""
    cin, cout = w.shape[2], w.shape[3]
    q = np.arange(3) - 1
    r = np.arange(2)
    ky = 2 * q[:, None] + r[None, :] + 1  # [3, 2]
    valid = (ky >= 0) & (ky < 4)
    kyc = np.clip(ky, 0, 3)
    w_y = jnp.take(w, jnp.asarray(kyc.reshape(-1)), axis=0).reshape(3, 2, 4, cin, cout)
    w_yx = jnp.take(w_y, jnp.asarray(kyc.reshape(-1)), axis=2).reshape(
        3, 2, 3, 2, cin, cout
    )
    mask = jnp.asarray(
        (valid[:, :, None, None] & valid[None, None, :, :]).astype(np.float32)
    )
    w_yx = w_yx * mask[..., None, None].astype(w.dtype)
    # [qy, qx, (ry, rx, cin), cout]
    return w_yx.transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 4 * cin, cout)


def conv4x4s2_s2d(x_s2d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """4×4 stride-2 pad-1 conv evaluated on the s2d input → normal-layout
    half-res output."""
    w2 = _s2d_down4x4_kernel(w)
    return jax.lax.conv_general_dilated(
        x_s2d, w2, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _s2d_upT4x4_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose 4×4 stride-2 pad-1, weight [4, 4, Cout, Cin] (this
    framework's ConvTranspose layout) → [3, 3, Cin, 4Cout] stride-1 pad-1
    kernel consuming the normal low-res input and emitting the s2d form of
    the 2× output (k = d + 1 − 2q)."""
    cout, cin = w.shape[2], w.shape[3]
    q = np.arange(3) - 1
    d = np.arange(2)
    k = d[None, :] + 1 - 2 * q[:, None]  # [3, 2]
    valid = (k >= 0) & (k < 4)
    kc = np.clip(k, 0, 3)
    w_y = jnp.take(w, jnp.asarray(kc.reshape(-1)), axis=0).reshape(3, 2, 4, cout, cin)
    w_yx = jnp.take(w_y, jnp.asarray(kc.reshape(-1)), axis=2).reshape(
        3, 2, 3, 2, cout, cin
    )
    mask = jnp.asarray(
        (valid[:, :, None, None] & valid[None, None, :, :]).astype(np.float32)
    )
    w_yx = w_yx * mask[..., None, None].astype(w.dtype)
    # [qy, qx, cin, (dy, dx, cout)]
    return w_yx.transpose(0, 2, 5, 1, 3, 4).reshape(3, 3, cin, 4 * cout)


def convT4x4s2_s2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose 4×4 stride-2 pad-1 emitting the s2d form of the 2×
    output ([B, H, W, 4Cout] on the INPUT grid)."""
    w2 = _s2d_upT4x4_kernel(w)
    return jax.lax.conv_general_dilated(
        x, w2, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _block_diag_kernel(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Per-group kernel [k, k, cin/g, cout] (groups stacked on cout) → ONE
    dense block-diagonal kernel [k, k, cin, cout].

    Every small-group lowering measured on this toolchain falls off the MXU
    fast path: feature_group_count=2 runs 2.31 ms/frame and per-group convs
    + concat ~2.1 at [16, 512, 512, 128], while the same values as a dense
    block-diagonal conv run **0.80** (tools/probe_up3_conv_variants.py,
    round 4).  The extra terms multiply structural zeros, so the outputs are
    bit-identical for finite inputs — the MXU is idle at these lane-bound
    shapes and the 2× nominal FLOPs are free."""
    if groups == 1:
        return w
    cg, cout = w.shape[2], w.shape[3]
    cog = cout // groups
    blocks = []
    for gi in range(groups):
        wg = w[..., gi * cog : (gi + 1) * cog]
        blocks.append(
            jnp.pad(wg, [(0, 0), (0, 0), (gi * cg, (groups - 1 - gi) * cg), (0, 0)])
        )
    return jnp.concatenate(blocks, axis=-1)


def _grouped_conv(x, w, stride: int, padding: int, groups: int) -> jnp.ndarray:
    """Grouped conv lowered as ONE dense block-diagonal conv (see
    ``_block_diag_kernel``)."""
    return jax.lax.conv_general_dilated(
        x, _block_diag_kernel(w, groups),
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _s2d_grouped(
    x_s2d: jnp.ndarray, w: jnp.ndarray, groups: int, conv_fn, phases: int = 4
) -> jnp.ndarray:
    """Grouped s2d conv: build the dense block-diagonal kernel FIRST (in
    dense-channel coordinates), then let ``conv_fn`` apply its linear s2d
    kernel transform — the s2d layout keeps (phase, c) channel interleaving
    with c spanning both groups, which is exactly the dense kernel's input
    layout.  ``phases`` is 4**level (kept for call-site compatibility)."""
    del phases
    return conv_fn(x_s2d, _block_diag_kernel(w, groups))


class Conv2dWN(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, s2d: int = 0) -> jnp.ndarray:
        # ``s2d`` is the space-to-depth level (bool True == 1; 2 = 4×4 blocks)
        phases = 4 ** int(s2d)
        cin = x.shape[-1] // phases
        k = self.kernel_size
        v = self.param(
            "v", nn.initializers.lecun_normal(), (k, k, cin // self.groups, self.features)
        )
        g = self.param("g", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        w = _wn_kernel(v, g)
        if s2d:
            # identical math in space-to-depth coordinates (full vector lanes)
            assert self.stride == 1 and k in (1, 3)
            if int(s2d) == 1:
                fn = conv3x3_s2d if k == 3 else conv1x1_s2d
            else:
                fn = conv3x3_s2d2 if k == 3 else conv1x1_s2d2
            out = _s2d_grouped(x.astype(w.dtype), w, self.groups, fn, phases=phases)
            return out + jnp.tile(b.astype(w.dtype), phases)[None, None, None]
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
    def __call__(
        self,
        x: jnp.ndarray,
        s2d: int = 0,
        s2d_down: bool = False,
        weights_only: bool = False,
    ) -> jnp.ndarray:
        phases = 4 if s2d_down else 4 ** int(s2d)
        cin = x.shape[-1] // phases
        k = self.kernel_size
        v = self.param(
            "v", nn.initializers.lecun_normal(), (k, k, cin // self.groups, self.features)
        )
        g = self.param("g", nn.initializers.ones, (self.features,))
        bias = self.param(
            "bias", nn.initializers.zeros, (self.height, self.width, self.features)
        )
        w = _wn_kernel(v, g)
        if weights_only:
            # callers fusing several WN convs into one (e.g. the decoder's
            # final verts/tex pair) take the normalized kernel + bias; x is
            # used only for shape inference and stays dead in the graph
            return w, bias
        if s2d_down:
            # 4×4 stride-2 conv consuming s2d input → normal half-res output
            assert self.stride == 2 and k == 4 and self.padding == 1 and self.groups == 1
            out = conv4x4s2_s2d(x.astype(w.dtype), w)
            return out + bias[None].astype(w.dtype)
        if s2d:
            assert self.stride == 1 and k in (1, 3)
            if int(s2d) == 1:
                fn = conv3x3_s2d if k == 3 else conv1x1_s2d
            else:
                fn = conv3x3_s2d2 if k == 3 else conv1x1_s2d2
            out = _s2d_grouped(x.astype(w.dtype), w, self.groups, fn, phases=phases)
            b = bias[None].astype(w.dtype)
            for _ in range(int(s2d)):
                b = space_to_depth(b)
            return out + b
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
    def __call__(self, x: jnp.ndarray, s2d_out: bool = False) -> jnp.ndarray:
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
        if s2d_out:
            # emit the 2× output in s2d form on the input grid
            assert k == 4 and self.stride == 2 and self.padding == 1
            out = convT4x4s2_s2d(x.astype(cd), w)
            return out + space_to_depth(bias[None].astype(cd))
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
    if H >= 256:
        # direct contractions with C riding as the minor dim — XLA folds the
        # layout shuffle into the matmuls instead of materialising the two
        # full-size transposes (measured ~20% faster at 512²/32ch+, B=16)
        y = jnp.einsum("oh,bhwc->bowc", Ry, x)
        return jnp.einsum("ow,bhwc->bhoc", Rx, y)
    # rows: [Ho,H] × [B,H,(W·C)]
    y = jnp.einsum("oh,bhx->box", Ry, x.reshape(B, H, W * C)).reshape(B, Ho, W, C)
    # cols in W-minor layout: [Wo,W] × [B,Ho,C,W]
    yt = y.transpose(0, 1, 3, 2)
    z = jnp.einsum("ow,bhcw->bhco", Rx, yt)
    return z.transpose(0, 1, 3, 2)


def resize_bilinear_s2d(
    x_s2d: jnp.ndarray, size: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """``resize_bilinear`` evaluated entirely in space-to-depth coordinates:
    [B, H/2, W/2, 4C] → [B, Ho/2, Wo/2, 4C], channel layout (ry, rx, c).

    Same separable 2-tap interpolation, with the static [n_out, n_in]
    matrices phase-split so neither operand leaves the s2d layout — the
    decoder tail chains resize → conv → seam → conv without any s2d/d2s
    relayout passes (measured: each 1024²×32ch relayout costs ~0.5-1 ms/frame
    at the production batch, see tools/probe_relayout.py)."""
    B, h, w, CP = x_s2d.shape
    C = CP // 4
    Ho, Wo = size
    if (Ho, Wo) == (2 * h, 2 * w):
        return x_s2d
    Ry = _interp_matrix(2 * h, Ho, align_corners).reshape(Ho // 2, 2, h, 2)
    Rx = _interp_matrix(2 * w, Wo, align_corners).reshape(Wo // 2, 2, w, 2)
    x6 = x_s2d.reshape(B, h, w, 2, 2, C)
    y = jnp.einsum("ORiq,biwqxc->bORwxc", jnp.asarray(Ry, x_s2d.dtype), x6)
    z = jnp.einsum("PSjx,bORjxc->bOPRSc", jnp.asarray(Rx, x_s2d.dtype), y)
    return z.reshape(B, Ho // 2, Wo // 2, 4 * C)


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
