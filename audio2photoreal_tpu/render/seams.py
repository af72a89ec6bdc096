"""UV-seam fixups.

Port of visualize/ca_body/utils/seams.py: ``impaint_batch`` (:16-21) copies
precomputed source texels over destination texels; ``resample_tex`` (:23-52)
blends grid-sampled values across the seam by precomputed weights.  The
index/weight tables ship in the static assets.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from audio2photoreal_tpu.ops.gridsample import grid_sample_bilinear


@dataclass
class SeamSampler:
    # impaint copy tables: dst ← src texel indices (flat [N] into H·W)
    impaint_dst: jnp.ndarray  # [N] int32
    impaint_src: jnp.ndarray  # [N] int32
    # resample tables
    resample_uvs: jnp.ndarray  # [M, 2] normalized sample coords in [-1, 1]
    resample_dst: jnp.ndarray  # [M] int32 flat texel index
    resample_weights: jnp.ndarray  # [M] blend weight
    uv_size: int

    def impaint(self, tex: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, C]: copy src → dst texels (seams.py:16-21)."""
        B, H, W, C = tex.shape
        flat = tex.reshape(B, H * W, C)
        src_vals = flat[:, self.impaint_src]
        flat = flat.at[:, self.impaint_dst].set(src_vals)
        return flat.reshape(B, H, W, C)

    def resample(self, tex: jnp.ndarray) -> jnp.ndarray:
        """Blend re-sampled seam texels into the texture (seams.py:23-52)."""
        B, H, W, C = tex.shape
        grid = jnp.broadcast_to(
            self.resample_uvs[None, :, None, :], (B, self.resample_uvs.shape[0], 1, 2)
        )
        # padding_zero=False clamps to the border, matching the reference's
        # grid_sample(padding_mode="border") (seams.py:26)
        sampled = grid_sample_bilinear(tex, grid, align_corners=False, padding_zero=False)[
            :, :, 0, :
        ]
        flat = tex.reshape(B, H * W, C)
        dst_vals = flat[:, self.resample_dst]
        w = self.resample_weights[None, :, None].astype(tex.dtype)
        blended = dst_vals * (1.0 - w) + sampled.astype(tex.dtype) * w
        # keep the scatter in the texture's dtype — a mixed-dtype .set would
        # upcast (and copy) the whole buffer
        flat = flat.at[:, self.resample_dst].set(blended)
        return flat.reshape(B, H, W, C)

    def __call__(self, tex: jnp.ndarray) -> jnp.ndarray:
        return self.resample(self.impaint(tex))
