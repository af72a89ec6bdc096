"""Codec-avatar render benchmark at production scale on the real TPU.

Second north-star metric (BASELINE.md): ca_body render FPS.  Drives the full
BodyAvatar decode path — ConvDecoder (1024² UV), UNet view decoder,
pose-shadow, 2048² upscale/forward_tex, rasterization — batched over frames,
like the reference's per-frame loop (visualize/render_codes.py:97-127) but
jitted as one program over a frame batch.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig


def main(frame_batch: int = 4, n_runs: int = 5, image=(1024, 704)):
    cfg = RendererConfig(
        uv_size=1024,
        init_uv_size=64,
        upscale_size=2048,
        n_embs=256,
        n_face_embs=256,
        shadow_size=256,
        encoder_in_size=512,
        face_tex_size=1024,
        n_face_verts=512,  # synthetic mesh is small; tex pyramid is full-size
        image_height=image[0],
        image_width=image[1],
    )
    assets = make_synthetic_assets(cfg)
    model = BodyAvatar(cfg, assets)
    B = frame_batch
    motion = jnp.asarray(np.random.RandomState(0).randn(B, 104).astype(np.float32) * 0.1)
    campos = jnp.asarray(np.tile([0.0, -3.0, 1.0], (B, 1)).astype(np.float32))
    K = jnp.asarray(np.tile([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], (B, 1, 1)).astype(np.float32))
    Rt = jnp.asarray(np.tile([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], (B, 1, 1)).astype(np.float32))
    embs = jnp.zeros((B, cfg.n_embs))
    face_embs = jnp.zeros((B, cfg.n_face_embs))

    print("init params (jitted)", file=sys.stderr, flush=True)
    params = jax.jit(
        lambda r: model.init(
            {"params": r}, motion, campos, embs=embs, face_embs_body=face_embs,
            encode=False, render=True, K=K, Rt=Rt,
        )
    )(jax.random.PRNGKey(0))

    from audio2photoreal_tpu.render.layers import render_compute_dtype

    def render(p, motion, campos, K, Rt, embs, face_embs):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, motion, campos, embs=embs, face_embs_body=face_embs,
                encode=False, render=True, K=K, Rt=Rt,
            )["rgb"]

    print("compile render", file=sys.stderr, flush=True)
    rc = jax.jit(render)
    out = rc(params, motion, campos, K, Rt, embs, face_embs)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = rc(params, motion, campos, K, Rt, embs, face_embs)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / n_runs
    fps = B / wall
    print(
        json.dumps(
            {"metric": "render_fps_1024x704_uv1024", "value": round(fps, 2),
             "unit": "frames_per_sec", "vs_baseline": round(fps / 30.0, 3)}
        )
    )


if __name__ == "__main__":
    main()
