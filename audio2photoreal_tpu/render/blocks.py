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
    # space-to-depth level for the lane-bound fast path.  Level 2 (4×4
    # blocks) wins in ISOLATED conv microbenchmarks (1.53 → 1.14 ms/frame at
    # 16ch/1024²) but LOSES in the full decoder (conv_decoder 13.4 → 19.7
    # ms/frame, bench_render B=16): the extra relayouts break XLA fusion
    # with the surrounding resize/seam ops.  Kept as an opt-in (tested for
    # exactness) — default stays 1.
    s2d_level: int = 1
    # s2d_in/s2d_out: the input/output tensor is ALREADY in s2d-1 layout
    # ((ry, rx, c) channel blocks) — the decoder tail chains several s2d
    # blocks plus the seam + final conv without relayouts in between; the
    # 2× upsample runs in s2d coordinates (resize_bilinear_s2d)
    s2d_in: bool = False
    s2d_out: bool = False

    def _use_s2d(self, cin: int) -> bool:
        # the s2d path wins when the conv is lane-bound: big spatial extent,
        # few channels (≤ 32 per group fills ≤ a quarter of the 128 lanes)
        return (
            self.size >= 256
            and cin % self.groups == 0
            and self.out_channels % self.groups == 0
            and cin // self.groups <= 32
            and self.out_channels // self.groups <= 32
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from audio2photoreal_tpu.render.layers import (
            depth_to_space,
            resize_bilinear_s2d,
            space_to_depth,
        )

        cin = x.shape[-1] // (4 if self.s2d_in else 1)
        if not self._use_s2d(cin):
            assert not (self.s2d_in or self.s2d_out), "s2d IO needs the s2d path"
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
        # ---- space-to-depth fast path: identical math, full vector lanes ----
        # the SAME WN layer modules declare the parameters (identical trees /
        # converters); `s2d` runs their conv algebra in s2d coordinates
        lvl = self.s2d_level if self.size >= 4 * 2**self.s2d_level else 1
        # s2d IO is only defined for level-1 layout: at lvl>1 the else-branch
        # below would bilinear-resize an s2d-layout tensor as if dense and the
        # s2d_out early-return would be skipped, silently breaking the
        # caller's layout tracking
        assert lvl == 1 or not (self.s2d_in or self.s2d_out), (
            "s2d_in/s2d_out require s2d_level == 1 at this size"
        )
        if (self.s2d_in or self.s2d_out) and lvl == 1:
            # relayout-free variant: upsample in s2d coordinates; convert at
            # the block edge only where the neighbor is dense (the s2d at the
            # INPUT resolution is 4× cheaper than after the resize)
            s = x if self.s2d_in else space_to_depth(x)
            s = resize_bilinear_s2d(s, (self.size, self.size), align_corners=True)
        else:
            x_up = resize_bilinear(x, (self.size, self.size), align_corners=True)
            s = x_up
            for _ in range(lvl):
                s = space_to_depth(s)
        skip = Conv2dWN(
            self.out_channels, kernel_size=1, padding=0, groups=self.groups,
            name="conv_resize",
        )(s, s2d=lvl)
        h = Conv2dWNUB(
            cin, self.size, self.size, 3, 1, 1, groups=self.groups, name="conv1"
        )(s, s2d=lvl)
        h = lrelu(h)
        h = Conv2dWNUB(
            self.out_channels, self.size, self.size, 3, 1, 1, groups=self.groups,
            name="conv2",
        )(h, s2d=lvl)
        h = lrelu(h)
        h = h + skip
        if self.s2d_out and lvl == 1:
            return h
        for _ in range(lvl):
            h = depth_to_space(h)
        return h


class UpscaleNet(nn.Module):
    """1024 → 2048 pixel-shuffle residual upscaler.

    The reference carries TWO UpscaleNet definitions: the avatar model uses
    its own (ONE 3×3 conv + 1×1 out block, mesh_vae_drivable.py:740-770 —
    this is what body_dec.ckpt contains; default ``n_convs=1``), while
    nn/blocks.py:757-786 has a two-conv variant nothing in the shipped
    inference path instantiates (``n_convs=2`` kept for completeness)."""

    out_channels: int = 3
    n_ftrs: int = 16
    size: int = 1024
    upscale_factor: int = 2
    n_convs: int = 1
    # see UpConvBlockDeep.s2d_level: level 2 wins in isolation, loses in the
    # full forward_tex (9.4 → 11.6 ms/frame) — opt-in only, default 1
    s2d_level: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # 3×3 conv(s), then the 1×1 out block.
        # ≤16-channel convs at 1024² are lane-bound — run them in s2d coords
        s2d = 0
        if self.size >= 256 and x.shape[-1] <= 32 and self.n_ftrs <= 32:
            s2d = self.s2d_level
        if s2d:
            from audio2photoreal_tpu.render.layers import depth_to_space, space_to_depth

            for _ in range(s2d):
                x = space_to_depth(x)
        h = x
        for i in range(self.n_convs):
            h = Conv2dWNUB(
                self.n_ftrs, self.size, self.size, 3, 1, 1, name=f"conv_block{i}"
            )(h, s2d=s2d)
            h = lrelu(h)
        h = Conv2dWNUB(
            self.out_channels * self.upscale_factor**2,
            self.size, self.size, 1, 1, 0, name="out_block",
        )(h, s2d=s2d)
        if s2d:
            for _ in range(s2d):
                h = depth_to_space(h)
        return pixel_shuffle(h, self.upscale_factor)
