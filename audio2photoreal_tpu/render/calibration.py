"""Per-camera calibration modules (training-time photometric alignment).

Ports of visualize/ca_body/nn/color_cal.py and dof_cal.py:
- ``CalV3`` (:64-99): per-camera 1×1 channel affine (grouped conv),
- ``CalV5`` (:100-321): Gaussian-blur + per-channel affine with LR-scaled
  identity-camera handling,
- ``LearnableBlur`` (dof_cal.py:16-52): per-camera softmax mix of
  identity / 3×3 / 7×7 Gaussian blurs,
- ``CameraPixelBias``: per-camera low-res learned bias upsampled to the
  render (mesh_vae_drivable.py pixel_cal).

Cameras are indexed by integer id; the name→index map lives with the caller
(the reference's ParamHolder, ca_body/utils/torch.py:55).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.layers import resize_bilinear


def gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur, NHWC, SAME padding."""
    k = jnp.asarray(gaussian_kernel1d(size, sigma))
    C = img.shape[-1]
    kh = jnp.tile(k[:, None, None, None], (1, 1, 1, C))  # depthwise
    kw = jnp.tile(k[None, :, None, None], (1, 1, 1, C))
    img = jax.lax.conv_general_dilated(
        img, kh, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return jax.lax.conv_general_dilated(
        img, kw, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


class CalV3(nn.Module):
    """Per-camera per-channel affine: y = w[cam] · x + b[cam]."""

    n_cameras: int
    identity_camera: int = 0

    @nn.compact
    def __call__(self, img: jnp.ndarray, cam_idx: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (self.n_cameras, 3))
        b = self.param("bias", nn.initializers.zeros, (self.n_cameras, 3))
        return img * w[cam_idx][:, None, None, :] + b[cam_idx][:, None, None, :]


class CalV5(nn.Module):
    """Blur-then-affine calibration (color_cal.py:100-321): the blur models
    sensor MTF differences, the affine per-camera color response.  The
    identity camera's params are pinned by zero-ing its gradient via a
    stop-gradient blend (the reference uses a grad hook, :26-35)."""

    n_cameras: int
    identity_camera: int = 0
    blur_size: int = 5
    blur_sigma: float = 1.0

    @nn.compact
    def __call__(self, img: jnp.ndarray, cam_idx: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (self.n_cameras, 3))
        b = self.param("bias", nn.initializers.zeros, (self.n_cameras, 3))
        is_ident = (jnp.arange(self.n_cameras) == self.identity_camera)[:, None]
        w = jnp.where(is_ident, jax.lax.stop_gradient(w), w)
        b = jnp.where(is_ident, jax.lax.stop_gradient(b), b)
        blurred = gaussian_blur(img, self.blur_size, self.blur_sigma)
        return blurred * w[cam_idx][:, None, None, :] + b[cam_idx][:, None, None, :]


class LearnableBlur(nn.Module):
    """Per-camera depth-of-field proxy (dof_cal.py:16-52): softmax-weighted
    mix of identity, 3×3, and 7×7 Gaussian blurs."""

    n_cameras: int

    @nn.compact
    def __call__(self, img: jnp.ndarray, cam_idx: jnp.ndarray) -> jnp.ndarray:
        logits = self.param("weights", nn.initializers.zeros, (self.n_cameras, 3))
        mix = jax.nn.softmax(logits[cam_idx], axis=-1)  # [B, 3]
        b3 = gaussian_blur(img, 3, 1.0)
        b7 = gaussian_blur(img, 7, 2.0)
        stack = jnp.stack([img, b3, b7], axis=-1)  # [B, H, W, C, 3]
        return (stack * mix[:, None, None, None, :]).sum(-1)

    @staticmethod
    def reg(params, cam_idx):
        """Regularizer toward the identity kernel (dof_cal reg)."""
        mix = jax.nn.softmax(params["weights"][cam_idx], axis=-1)
        return (1.0 - mix[:, 0]).mean()


class CameraPixelBias(nn.Module):
    """Per-camera learned pixel bias at low res, bilinearly upsampled onto
    the render and broadcast over channels (mesh_vae_drivable.py:52-70:
    bias is [n_cameras, 1, H/ds, W/ds])."""

    n_cameras: int
    height: int
    width: int
    ds_rate: int = 8

    @nn.compact
    def __call__(self, cam_idx: jnp.ndarray) -> jnp.ndarray:
        h, w = self.height // self.ds_rate, self.width // self.ds_rate
        bias = self.param("bias", nn.initializers.zeros, (self.n_cameras, h, w, 1))
        return resize_bilinear(bias[cam_idx], (self.height, self.width))
