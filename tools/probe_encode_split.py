"""Split decode_frame's encode 9.33 ms/frame: face translation
(decoder_face -> encoder_face) vs body encode (unpose -> to_uv -> encoder)."""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np
from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.layers import render_compute_dtype
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

B, K = 16, 6
cfg = RendererConfig(
    uv_size=1024, init_uv_size=64, upscale_size=2048, n_embs=256,
    n_face_embs=256, shadow_size=256, encoder_in_size=512,
    face_tex_size=1024, n_face_verts=512, image_height=1024, image_width=704,
)
assets = make_synthetic_assets(cfg, mesh_density=10)
model = BodyAvatar(cfg, assets)
rng = np.random.RandomState(0)
motion = jnp.asarray(rng.randn(B, 104).astype(np.float32) * 0.1)
face_codes = jnp.asarray(rng.randn(B, cfg.n_face_embs).astype(np.float32) * 0.1)
geom0 = assets.lbs.pose(None, motion)
campos = jnp.asarray(np.tile([0.0, -3.0, 1.0], (B, 1)).astype(np.float32))
params = jax.jit(
    lambda r: model.init(
        {"params": r}, motion, campos, geom=geom0, face_embs=face_codes,
        encode=True, render=False,
    )
)(jax.random.PRNGKey(0))

def chain(name, body, *args):
    def run(*a):
        def step(c, i):
            return jnp.float32(body(i, *a)), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))[0]
    c = jax.jit(run)
    float(c(*args))
    pert = tuple((x + jnp.asarray(1e-4, x.dtype)) for x in args)
    t0 = time.time()
    float(c(*pert))
    print(f"{name}: {(time.time() - t0) / K / B * 1000:.2f} ms/frame", flush=True)

def face_tr(i, f):
    with render_compute_dtype(jnp.bfloat16):
        out = model.apply(params, f + i * 1e-4,
                          method=BodyAvatar.face_codes_to_body_embs)
        return jnp.sum(out)

def face_dec_only(i, f):
    with render_compute_dtype(jnp.bfloat16):
        out = model.apply(params, f + i * 1e-4,
                          method=lambda m, ff: m.decoder_face(ff))
        return jnp.sum(out["face_tex"][:, ::64, ::64].astype(jnp.float32)) + jnp.sum(out["face_geom"][:, ::16])

def body_enc(i, m):
    with render_compute_dtype(jnp.bfloat16):
        g = assets.lbs.pose(None, m + i * 1e-5)
        def run(mod, gg, mm):
            vu = jax.lax.stop_gradient(mod.assets.lbs.unpose(gg, mm))
            uv = mod.assets.geo.to_uv(vu)
            return mod.encoder(uv)["embs"]
        return jnp.sum(model.apply(params, g, m + i * 1e-5, method=run))

chain("face translation (dec_face+enc_face)", face_tr, face_codes)
chain("  decoder_face only", face_dec_only, face_codes)
chain("body encode (unpose+to_uv+encoder)", body_enc, motion)
