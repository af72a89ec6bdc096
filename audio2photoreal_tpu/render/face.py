"""Frontal face decoder (frozen conditioning translator).

Port of ``FaceDecoderFrontal`` (visualize/ca_body/nn/face.py:18-85): frozen
HQLP face codes → (7306·3 face geometry, 1024² face texture) via a linear
geometry head and a deconv texture pyramid conditioned on a fixed frontal
view.  Its outputs feed the body-space FaceEncoder
(mesh_vae_drivable.py:265-267, 637-719).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from audio2photoreal_tpu.render.layers import ConvTranspose2dWNUB, LinearWN

lrelu = lambda x: nn.leaky_relu(x, negative_slope=0.2)


_TEX_PYRAMID = [256, 128, 128, 64, 64, 32, 8, 3]  # channel plan at tex_size=1024


class FaceDecoderFrontal(nn.Module):
    frontal_view: jnp.ndarray  # [3] static asset
    n_latent: int = 256
    n_vert_out: int = 3 * 7306
    tex_size: int = 1024
    tex_pyramid: Tuple[int, ...] = ()  # default: tail of _TEX_PYRAMID

    @nn.compact
    def __call__(self, face_embs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        B = face_embs.shape[0]
        enc = lrelu(LinearWN(256, name="encmod")(face_embs))
        geom = LinearWN(self.n_vert_out, name="geommod")(enc)
        view = jnp.broadcast_to(self.frontal_view[None], (B, 3))
        viewout = lrelu(LinearWN(8, name="viewmod")(view))
        encview = jnp.concatenate([enc, viewout], axis=-1)
        h = lrelu(LinearWN(256 * 4 * 4, name="texmod2")(encview))
        h = h.reshape(B, 4, 4, 256)
        import math

        n_ups = int(math.log2(self.tex_size // 4))
        chan_plan = list(self.tex_pyramid) or _TEX_PYRAMID[-n_ups:]
        chan_plan = chan_plan[:-1] + [3]
        chans = [(c, 4 * 2 ** (i + 1)) for i, c in enumerate(chan_plan)]
        for i, (c, size) in enumerate(chans):
            h = ConvTranspose2dWNUB(c, size, size, 4, 2, 1, name=f"texmod_up{i}")(h)
            if i < len(chans) - 1:
                h = lrelu(h)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.tex_size, self.tex_size, 3)
        )
        tex_raw = h
        tex = tex_raw + bias[None]
        return {
            "face_geom": geom.reshape(B, -1, 3),
            "face_tex_raw": tex_raw,
            "face_tex": 255.0 * (tex + 0.5),
        }
