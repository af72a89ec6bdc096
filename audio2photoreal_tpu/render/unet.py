"""UNet with weight-norm + untied-bias convs and additive skips.

Port of ``UNetWB`` (visualize/ca_body/nn/unet.py:16-97): 5 stride-2 downs,
5 stride-2 transpose ups with ADDITIVE skip connections, input concat at the
end, 1×1 out conv scaled by ``out_scale=0.1``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from audio2photoreal_tpu.render.layers import Conv2dWNUB, ConvTranspose2dWNUB, resize_bilinear

lrelu = lambda x: nn.leaky_relu(x, negative_slope=0.2)


class UNetWB(nn.Module):
    out_channels: int
    size: int
    n_init_ftrs: int = 8
    out_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from audio2photoreal_tpu.render.layers import depth_to_space, space_to_depth

        F = self.n_init_ftrs
        S = self.size
        # narrow-channel convs at big spatial extents are TPU-lane-bound;
        # stride-2 downs consume s2d input (conv4x4s2_s2d), the last ups emit
        # s2d output (convT4x4s2_s2d) — identical math, full vector lanes
        fast = S >= 512 and F <= 16
        x1 = x

        def down(feat, size, name, xin):
            if fast and xin.shape[-1] <= 32:
                return lrelu(
                    Conv2dWNUB(feat, size, size, 4, 2, 1, name=name)(
                        space_to_depth(xin), s2d_down=True
                    )
                )
            return lrelu(Conv2dWNUB(feat, size, size, 4, 2, 1, name=name)(xin))

        x2 = down(F, S // 2, "down1", x1)
        x3 = down(2 * F, S // 4, "down2", x2)
        x4 = down(4 * F, S // 8, "down3", x3)
        x5 = down(8 * F, S // 16, "down4", x4)
        x6 = down(16 * F, S // 32, "down5", x5)

        def up(feat, size, name, hin, skip=None):
            if fast and feat <= 32 and size >= 512:
                h = ConvTranspose2dWNUB(feat, size, size, 4, 2, 1, name=name)(
                    hin, s2d_out=True
                )
                h = lrelu(h)
                if skip is not None:
                    h = h + space_to_depth(skip)
                return depth_to_space(h)
            h = lrelu(ConvTranspose2dWNUB(feat, size, size, 4, 2, 1, name=name)(hin))
            return h if skip is None else h + skip

        h = up(8 * F, S // 16, "up1", x6, x5)
        h = up(4 * F, S // 8, "up2", h, x4)
        h = up(2 * F, S // 4, "up3", h, x3)
        h = up(F, S // 2, "up4", h, x2)
        h = up(F, S, "up5", h)
        h = jnp.concatenate([h, x1], axis=-1)
        if fast and h.shape[-1] <= 32:
            out = Conv2dWNUB(self.out_channels, S, S, 1, 1, 0, name="out")(
                space_to_depth(h), s2d=True
            )
            out = depth_to_space(out)
        else:
            out = Conv2dWNUB(self.out_channels, S, S, 1, 1, 0, name="out")(h)
        return out * self.out_scale


class UNetWBConcat(nn.Module):
    """UNetWB variant with CONCAT skip connections (reference:
    visualize/ca_body/nn/unet.py:98-181)."""

    out_channels: int
    size: int
    n_init_ftrs: int = 8
    out_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        F = self.n_init_ftrs
        S = self.size
        x1 = x
        x2 = lrelu(Conv2dWNUB(F, S // 2, S // 2, 4, 2, 1, name="down1")(x1))
        x3 = lrelu(Conv2dWNUB(2 * F, S // 4, S // 4, 4, 2, 1, name="down2")(x2))
        x4 = lrelu(Conv2dWNUB(4 * F, S // 8, S // 8, 4, 2, 1, name="down3")(x3))
        x5 = lrelu(Conv2dWNUB(8 * F, S // 16, S // 16, 4, 2, 1, name="down4")(x4))
        x6 = lrelu(Conv2dWNUB(16 * F, S // 32, S // 32, 4, 2, 1, name="down5")(x5))
        h = lrelu(ConvTranspose2dWNUB(8 * F, S // 16, S // 16, 4, 2, 1, name="up1")(x6))
        h = lrelu(ConvTranspose2dWNUB(4 * F, S // 8, S // 8, 4, 2, 1, name="up2")(
            jnp.concatenate([h, x5], -1)))
        h = lrelu(ConvTranspose2dWNUB(2 * F, S // 4, S // 4, 4, 2, 1, name="up3")(
            jnp.concatenate([h, x4], -1)))
        h = lrelu(ConvTranspose2dWNUB(F, S // 2, S // 2, 4, 2, 1, name="up4")(
            jnp.concatenate([h, x3], -1)))
        h = lrelu(ConvTranspose2dWNUB(F, S, S, 4, 2, 1, name="up5")(
            jnp.concatenate([h, x2], -1)))
        h = jnp.concatenate([h, x1], axis=-1)
        out = Conv2dWNUB(self.out_channels, S, S, 1, 1, 0, name="out")(h)
        return out * self.out_scale


class UNetW(nn.Module):
    """Weight-norm UNet WITHOUT untied biases (reference: unet.py:182-254) —
    lighter variant for tied-bias checkpoints."""

    out_channels: int
    size: int
    n_init_ftrs: int = 8
    out_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from audio2photoreal_tpu.render.layers import Conv2dWN

        F = self.n_init_ftrs
        x1 = x
        acts = [x1]
        h = x1
        for i, c in enumerate([F, 2 * F, 4 * F, 8 * F, 16 * F]):
            h = lrelu(Conv2dWN(c, 4, 2, 1, name=f"down{i+1}")(h))
            acts.append(h)
        for i, c in enumerate([8 * F, 4 * F, 2 * F, F, F]):
            from audio2photoreal_tpu.render.layers import _conv_transpose

            # transpose conv without untied bias: reuse the WNUB layer's math
            # via a Conv after bilinear upsample (bias tied)
            h = resize_bilinear(h, (h.shape[1] * 2, h.shape[2] * 2))
            h = lrelu(Conv2dWN(c, 3, 1, 1, name=f"up{i+1}")(h))
            if i < 4:
                h = h + acts[4 - i]
        h = jnp.concatenate([h, x1], axis=-1)
        out = Conv2dWN(self.out_channels, 1, 1, 0, name="out")(h)
        return out * self.out_scale
