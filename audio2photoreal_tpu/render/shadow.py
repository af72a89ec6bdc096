"""Shadow networks.

Ports of visualize/ca_body/nn/shadow.py: ``ShadowUNet`` (:25-192) — AO map
minus mean → 4-level interp-down/up UNet → sigmoid(pred + β); and
``PoseToShadow`` (:418-462) — pose → shadow map deconv used at inference by
the body avatar (mesh_vae_drivable.py:322-329).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from audio2photoreal_tpu.render.layers import (
    Conv2dWN,
    Conv2dWNUB,
    ConvTranspose2dWNUB,
    LinearWN,
    resize_bilinear,
)

lrelu = lambda x: nn.leaky_relu(x, negative_slope=0.2)


class ShadowUNet(nn.Module):
    uv_size: int
    shadow_size: int
    ao_mean: jnp.ndarray  # [H, W, 1] static asset
    n_dims: int = 64
    beta: float = 1.0
    biases: bool = True
    interp_align: Optional[bool] = False  # bilinear default

    @nn.compact
    def __call__(self, ao_map: jnp.ndarray) -> dict:
        S = self.shadow_size
        if ao_map.shape[1:3] != (S, S):
            ao_map = resize_bilinear(ao_map, (S, S))
        ao_mean = self.ao_mean
        if ao_mean.shape[:2] != (S, S):
            ao_mean = resize_bilinear(ao_mean[None], (S, S))[0]
        x = ao_map - ao_mean[None]

        n = self.n_dims
        sizes = [S // (2**i) for i in range(4)]
        enc_acts = []
        for i, size in enumerate(sizes):
            x = lrelu(Conv2dWNUB(n, size, size, 3, 1, 1, name=f"enc{i}")(x))
            enc_acts.append(x)
            if i < len(sizes) - 1:
                x = resize_bilinear(x, (size // 2, size // 2), align_corners=True)

        for i in range(len(sizes)):
            size = sizes[-i - 1]
            if i > 0:
                x_prev = enc_acts[-i - 1]
                x = resize_bilinear(x, x_prev.shape[1:3], align_corners=True)
                x = jnp.concatenate([x, x_prev], axis=-1)
            x = lrelu(Conv2dWNUB(n, size, size, 3, 1, 1, name=f"dec{i}")(x))

        if self.biases:
            pred = Conv2dWNUB(1, sizes[0], sizes[0], 3, 1, 1, name="shadow_pred")(x)
        else:
            pred = Conv2dWN(1, 3, 1, 1, name="shadow_pred")(x)
        lowres = nn.sigmoid(pred + self.beta)
        shadow_map = resize_bilinear(lowres, (self.uv_size, self.uv_size))
        return {"shadow_map": shadow_map, "ao_map": ao_map, "shadow_map_lowres": lowres}


class ShadowUNetPoseCond(nn.Module):
    """ShadowUNet variant with pose conditioning injected at the bottleneck
    (reference: nn/shadow.py:249-417 ShadowUNet_PoseCond)."""

    uv_size: int
    shadow_size: int
    ao_mean: jnp.ndarray
    n_pose_dims: int = 104
    n_dims: int = 64
    beta: float = 1.0

    @nn.compact
    def __call__(self, ao_map: jnp.ndarray, pose: jnp.ndarray) -> dict:
        S = self.shadow_size
        if ao_map.shape[1:3] != (S, S):
            ao_map = resize_bilinear(ao_map, (S, S))
        ao_mean = self.ao_mean
        if ao_mean.shape[:2] != (S, S):
            ao_mean = resize_bilinear(ao_mean[None], (S, S))[0]
        x = ao_map - ao_mean[None]
        n = self.n_dims
        sizes = [S // (2**i) for i in range(4)]
        enc_acts = []
        for i, size in enumerate(sizes):
            x = lrelu(Conv2dWNUB(n, size, size, 3, 1, 1, name=f"enc{i}")(x))
            enc_acts.append(x)
            if i < len(sizes) - 1:
                x = resize_bilinear(x, (size // 2, size // 2), align_corners=True)
        # pose injection at the bottleneck
        pose_feat = lrelu(LinearWN(n, name="pose_fc")(pose))
        x = x + pose_feat[:, None, None, :]
        for i in range(len(sizes)):
            size = sizes[-i - 1]
            if i > 0:
                x_prev = enc_acts[-i - 1]
                x = resize_bilinear(x, x_prev.shape[1:3], align_corners=True)
                x = jnp.concatenate([x, x_prev], axis=-1)
            x = lrelu(Conv2dWNUB(n, size, size, 3, 1, 1, name=f"dec{i}")(x))
        pred = Conv2dWN(1, 3, 1, 1, name="shadow_pred")(x)
        lowres = nn.sigmoid(pred + self.beta)
        return {"shadow_map": resize_bilinear(lowres, (self.uv_size, self.uv_size))}


class FloorShadowDecoder(nn.Module):
    """Ground-plane shadow from a top-down occupancy/AO map
    (reference: nn/shadow.py:192-248)."""

    uv_size: int
    n_dims: int = 32
    beta: float = 1.0

    @nn.compact
    def __call__(self, height_map: jnp.ndarray) -> dict:
        S = height_map.shape[1]
        x = height_map
        acts = []
        for i, c in enumerate([self.n_dims, self.n_dims * 2, self.n_dims * 4]):
            x = lrelu(Conv2dWN(c, 3, 2, 1, name=f"down{i}")(x))
            acts.append(x)
        for i, c in enumerate([self.n_dims * 2, self.n_dims, self.n_dims]):
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
            x = lrelu(Conv2dWN(c, 3, 1, 1, name=f"up{i}")(x))
        pred = Conv2dWN(1, 3, 1, 1, name="shadow_pred")(x)
        lowres = nn.sigmoid(pred + self.beta)
        return {"shadow_map": resize_bilinear(lowres, (self.uv_size, self.uv_size))}


class DistMapShadowUNet(nn.Module):
    """Shadow from body-part distance maps (reference: nn/shadow.py:463-615):
    same UNet trunk as ShadowUNet but conditioned on K distance channels."""

    uv_size: int
    shadow_size: int
    n_channels: int = 8
    n_dims: int = 64
    beta: float = 1.0

    @nn.compact
    def __call__(self, dist_maps: jnp.ndarray) -> dict:
        S = self.shadow_size
        if dist_maps.shape[1:3] != (S, S):
            dist_maps = resize_bilinear(dist_maps, (S, S))
        x = dist_maps
        n = self.n_dims
        sizes = [S // (2**i) for i in range(4)]
        enc_acts = []
        for i, size in enumerate(sizes):
            x = lrelu(Conv2dWNUB(n, size, size, 3, 1, 1, name=f"enc{i}")(x))
            enc_acts.append(x)
            if i < len(sizes) - 1:
                x = resize_bilinear(x, (size // 2, size // 2), align_corners=True)
        for i in range(len(sizes)):
            size = sizes[-i - 1]
            if i > 0:
                x_prev = enc_acts[-i - 1]
                x = resize_bilinear(x, x_prev.shape[1:3], align_corners=True)
                x = jnp.concatenate([x, x_prev], axis=-1)
            x = lrelu(Conv2dWNUB(n, size, size, 3, 1, 1, name=f"dec{i}")(x))
        pred = Conv2dWN(1, 3, 1, 1, name="shadow_pred")(x)
        lowres = nn.sigmoid(pred + self.beta)
        return {"shadow_map": resize_bilinear(lowres, (self.uv_size, self.uv_size))}


class PoseToShadow(nn.Module):
    n_pose_dims: int
    uv_size: int
    beta: float = 1.0

    @nn.compact
    def __call__(self, pose: jnp.ndarray) -> dict:
        B = pose.shape[0]
        h = lrelu(LinearWN(256 * 4 * 4, name="fc_block")(pose))
        h = h.reshape(B, 4, 4, 256)  # NHWC (converter permutes from torch NCHW)
        h = lrelu(ConvTranspose2dWNUB(256, 8, 8, 4, 2, 1, name="conv0")(h))
        h = lrelu(ConvTranspose2dWNUB(128, 16, 16, 4, 2, 1, name="conv1")(h))
        h = lrelu(ConvTranspose2dWNUB(128, 32, 32, 4, 2, 1, name="conv2")(h))
        h = lrelu(ConvTranspose2dWNUB(64, 64, 64, 4, 2, 1, name="conv3")(h))
        h = ConvTranspose2dWNUB(1, 128, 128, 4, 2, 1, name="conv4")(h)
        lowres = nn.sigmoid(h + self.beta)
        shadow_map = resize_bilinear(lowres, (self.uv_size, self.uv_size))
        return {"shadow_map": shadow_map}
