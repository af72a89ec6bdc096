"""UV conv blocks (NHWC) — ports of visualize/ca_body/nn/blocks.py.

``ConvBlock`` (:232-277), ``ConvDownBlock`` (:323-371, stride-2 down),
``UpConvBlockDeep`` (:372-420, bilinear-up + convs, residual 1×1 resize path),
``PixelShuffleWN``/``UpscaleNet`` (:730-786).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from audio2photoreal_tpu.render.layers import (
    Conv2dWN,
    Conv2dWNUB,
    pixel_shuffle,
    resize_bilinear,
    tile2d,
)

lrelu = lambda x: nn.leaky_relu(x, negative_slope=0.2)


class ConvBlock(nn.Module):
    out_channels: int
    size: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        skip = Conv2dWN(self.out_channels, kernel_size=1, padding=0, name="conv_resize")(x)
        h = Conv2dWNUB(
            cin, self.size, self.size, self.kernel_size, 1, self.padding, name="conv1"
        )(x)
        h = lrelu(h)
        h = Conv2dWNUB(
            self.out_channels, self.size, self.size, self.kernel_size, 1, self.padding,
            name="conv2",
        )(h)
        h = lrelu(h)
        return h + skip


class ConvDownBlock(nn.Module):
    out_channels: int
    size: int  # input size
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        skip = Conv2dWN(
            self.out_channels, kernel_size=1, stride=2, padding=0, groups=self.groups,
            name="conv_resize",
        )(x)
        h = Conv2dWNUB(
            cin, self.size, self.size, 3, 1, 1, groups=self.groups, name="conv1"
        )(x)
        h = lrelu(h)
        h = Conv2dWNUB(
            self.out_channels, self.size // 2, self.size // 2, 3, 2, 1,
            groups=self.groups, name="conv2",
        )(h)
        h = lrelu(h)
        return h + skip


class UpConvBlockDeep(nn.Module):
    out_channels: int
    size: int  # output size
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        x_up = resize_bilinear(x, (self.size, self.size), align_corners=True)
        skip = Conv2dWN(
            self.out_channels, kernel_size=1, padding=0, groups=self.groups,
            name="conv_resize",
        )(x_up)
        h = Conv2dWNUB(cin, self.size, self.size, 3, 1, 1, groups=self.groups, name="conv1")(x_up)
        h = lrelu(h)
        h = Conv2dWNUB(
            self.out_channels, self.size, self.size, 3, 1, 1, groups=self.groups, name="conv2"
        )(h)
        h = lrelu(h)
        return h + skip


class UpscaleNet(nn.Module):
    """1024 → 2048 pixel-shuffle residual upscaler
    (mesh_vae_drivable.py:740-770 + blocks.py:757-786)."""

    out_channels: int = 3
    n_ftrs: int = 16
    size: int = 1024
    upscale_factor: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # two 3×3 convs (reference blocks.py:761-766), then the 1×1 out block
        h = Conv2dWNUB(self.n_ftrs, self.size, self.size, 3, 1, 1, name="conv_block0")(x)
        h = lrelu(h)
        h = Conv2dWNUB(self.n_ftrs, self.size, self.size, 3, 1, 1, name="conv_block1")(h)
        h = lrelu(h)
        h = Conv2dWNUB(
            self.out_channels * self.upscale_factor**2,
            self.size, self.size, 1, 1, 0, name="out_block",
        )(h)
        return pixel_shuffle(h, self.upscale_factor)
