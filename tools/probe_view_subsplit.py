"""Sub-split of the per-view render tail: raster+gather on a PREPACKED
texture vs the full display+pack+seam+raster+gather chain — the difference
is the display stage's true in-context cost (is XLA already fusing the
2048^2 elementwise chain?).  Also times a pure gather at two texture sizes
to confirm the per-index (not per-byte) gather bound."""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np
from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.layers import render_compute_dtype
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig
from audio2photoreal_tpu.ops.gridsample import pack_rgb8
from audio2photoreal_tpu.render.color import linear2display_batch
from audio2photoreal_tpu.render.geometry import project_points
from audio2photoreal_tpu.render.rasterizer import render_mesh

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
K_mat = jnp.asarray(np.tile([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], (B, 1, 1)).astype(np.float32))
Rt = jnp.asarray(np.tile([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], (B, 1, 1)).astype(np.float32))
geom0 = assets.lbs.pose(None, motion)
tex2k = jnp.asarray(rng.rand(B, 2048, 2048, 3).astype(np.float32), jnp.bfloat16)
packed0 = assets.seam_2k.fused_apply_packed(pack_rgb8(linear2display_batch(tex2k.astype(jnp.float32))), 2)
jax.block_until_ready(packed0)

def chain(name, body, *args):
    def run(*a):
        def step(c, i):
            return jnp.float32(body(i, *a)), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))[0]
    c = jax.jit(run)
    float(c(*args))
    pert = tuple((x + (jnp.asarray(1, x.dtype) if x.dtype == jnp.int32 else jnp.asarray(1e-4, x.dtype))) for x in args)
    t0 = time.time()
    float(c(*pert))
    print(f"{name}: {(time.time() - t0) / K / B * 1000:.2f} ms/frame", flush=True)

def full_tail(i, tex, g):
    with render_compute_dtype(jnp.bfloat16):
        t = tex + i.astype(tex.dtype) * jnp.asarray(1e-4, tex.dtype)
        packed = pack_rgb8(linear2display_batch(t.astype(jnp.float32)))
        packed = assets.seam_2k.fused_apply_packed(packed, 2)
        pix, depth = project_points(g + i * 1e-5, K_mat, Rt)
        rgb, _ = render_mesh(pix, depth, assets.geo.faces, assets.geo.uv_coords,
                             assets.geo.uv_faces, t, cfg.image_height, cfg.image_width,
                             packed_display=True, texture_packed=packed)
        return jnp.sum(rgb[:, ::64, ::64].astype(jnp.float32))

def raster_only(i, packed, g):
    with render_compute_dtype(jnp.bfloat16):
        p = packed + i.astype(jnp.int32)  # fresh value, keeps RGB fields sane enough
        pix, depth = project_points(g + i * 1e-5, K_mat, Rt)
        rgb, _ = render_mesh(pix, depth, assets.geo.faces, assets.geo.uv_coords,
                             assets.geo.uv_faces, tex2k, cfg.image_height, cfg.image_width,
                             packed_display=True, texture_packed=p)
        return jnp.sum(rgb[:, ::64, ::64].astype(jnp.float32))

def display_only(i, tex):
    t = tex + i.astype(tex.dtype) * jnp.asarray(1e-4, tex.dtype)
    packed = pack_rgb8(linear2display_batch(t.astype(jnp.float32)))
    packed = assets.seam_2k.fused_apply_packed(packed, 2)
    return jnp.sum(packed[:, ::64, ::64].astype(jnp.float32))

chain("full tail (display+pack+seam+raster+gather)", full_tail, tex2k, geom0)
chain("raster+gather only (prepacked texture)", raster_only, packed0.astype(jnp.int32), geom0)
chain("display+pack+seam only", display_only, tex2k)
