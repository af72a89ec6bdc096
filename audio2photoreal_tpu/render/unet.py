"""UNet with weight-norm + untied-bias convs and additive skips.

Port of ``UNetWB`` (visualize/ca_body/nn/unet.py:16-97): 5 stride-2 downs,
5 stride-2 transpose ups with ADDITIVE skip connections, input concat at the
end, 1×1 out conv scaled by ``out_scale=0.1``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from audio2photoreal_tpu.render.layers import Conv2dWNUB, ConvTranspose2dWNUB

lrelu = lambda x: nn.leaky_relu(x, negative_slope=0.2)


class UNetWB(nn.Module):
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
        h = lrelu(ConvTranspose2dWNUB(8 * F, S // 16, S // 16, 4, 2, 1, name="up1")(x6)) + x5
        h = lrelu(ConvTranspose2dWNUB(4 * F, S // 8, S // 8, 4, 2, 1, name="up2")(h)) + x4
        h = lrelu(ConvTranspose2dWNUB(2 * F, S // 4, S // 4, 4, 2, 1, name="up3")(h)) + x3
        h = lrelu(ConvTranspose2dWNUB(F, S // 2, S // 2, 4, 2, 1, name="up4")(h)) + x2
        h = lrelu(ConvTranspose2dWNUB(F, S, S, 4, 2, 1, name="up5")(h))
        h = jnp.concatenate([h, x1], axis=-1)
        out = Conv2dWNUB(self.out_channels, S, S, 1, 1, 0, name="out")(h)
        return out * self.out_scale
