"""A/B: ConvDecoder (and full render) with s2d_tail True vs False, one
session, fresh-args + scalar-fetch + scan-chain discipline."""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from dataclasses import replace

from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.layers import render_compute_dtype
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

B, K = 16, 6
cfg = RendererConfig(
    uv_size=1024, init_uv_size=64, upscale_size=2048, n_embs=256,
    n_face_embs=256, shadow_size=256, encoder_in_size=512,
    face_tex_size=1024, n_face_verts=512, image_height=1024, image_width=704,
    s2d_tail=True,
)
assets = make_synthetic_assets(cfg, mesh_density=10)

rng = np.random.RandomState(0)
motion = jnp.asarray(rng.randn(B, 104).astype(np.float32) * 0.1)
campos = jnp.asarray(np.tile([0.0, -3.0, 1.0], (B, 1)).astype(np.float32))
K_mat = jnp.asarray(np.tile([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], (B, 1, 1)).astype(np.float32))
Rt = jnp.asarray(np.tile([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], (B, 1, 1)).astype(np.float32))
embs = jnp.zeros((B, cfg.n_embs))
face_embs = jnp.zeros((B, cfg.n_face_embs))


def chain(name, body, *args):
    def run(*a):
        def step(c, i):
            return jnp.float32(body(i, *a)), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))[0]

    c = jax.jit(run)
    float(c(*args))
    pert = tuple(
        (x + jnp.asarray(0.25, x.dtype)) if jnp.issubdtype(x.dtype, jnp.floating) else x
        for x in args
    )
    t0 = time.time()
    float(c(*pert))
    print(f"{name}: {(time.time() - t0) / K / B * 1000:.2f} ms/frame", flush=True)


DEC_ONLY = "--dec-only" in sys.argv
RENDER_ONLY = "--render-only" in sys.argv
TAILS = (True, False) if ("--no-repeat" in sys.argv) else (True, False, True)

for tail in TAILS:
    c = replace(cfg, s2d_tail=tail)
    model = BodyAvatar(c, assets)
    params = jax.jit(
        lambda r: model.init(
            {"params": r}, motion, campos, embs=embs, face_embs_body=face_embs,
            encode=False, render=True, K=K_mat, Rt=Rt,
        )
    )(jax.random.PRNGKey(0))

    def full_dec(i, m, model=model, params=params):
        with render_compute_dtype(jnp.bfloat16):
            out = model.apply(
                params, m + i * 1e-4, embs, face_embs,
                method=lambda mo, mm, e, f: mo.decoder(mm, e, f),
            )
            return jnp.sum(out["tex_mean_rec"][:, ::128, ::128].astype(jnp.float32))

    def full_render(i, m, model=model, params=params):
        with render_compute_dtype(jnp.bfloat16):
            out = model.apply(
                params, m + i * 1e-4, campos, embs=embs, face_embs_body=face_embs,
                encode=False, render=True, K=K_mat, Rt=Rt,
            )
            return jnp.sum(out["rgb"][:, ::128, ::128].astype(jnp.float32))

    if not RENDER_ONLY:
        chain(f"conv_decoder FULL (s2d_tail={tail})", full_dec, motion)
    if not DEC_ONLY:
        chain(f"FULL render      (s2d_tail={tail})", full_render, motion)
