"""Raster (tile, chunk) sweep at the production point (B=16, 1024x704,
~9.3k-face coherent mesh) — finer chunks mean less wasted barycentric math
per binned worklist entry; smaller tiles mean fewer faces per tile.

Probe hygiene (NOTES_ROUND3): K iterations scan-chained in ONE jit, fresh
argument values for every timed call, scalar fetch."""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.ops.pallas_raster import rasterize_pallas
from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.geometry import project_points
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

B, K, H, W = 16, 8, 1024, 704
cfg = RendererConfig(
    uv_size=1024, init_uv_size=64, upscale_size=2048, n_embs=256,
    n_face_embs=256, shadow_size=256, encoder_in_size=512,
    face_tex_size=1024, n_face_verts=512, image_height=H, image_width=W,
)
assets = make_synthetic_assets(cfg, mesh_density=10)
rng = np.random.RandomState(0)
motion = jnp.asarray(rng.randn(B, 104).astype(np.float32) * 0.1)
K_mat = jnp.asarray(np.tile([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], (B, 1, 1)).astype(np.float32))
Rt = jnp.asarray(np.tile([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], (B, 1, 1)).astype(np.float32))
geom = assets.lbs.pose(None, motion) + jnp.asarray(
    rng.randn(B, int(assets.geo.faces.max()) + 1, 3).astype(np.float32) * 1e-3
)
fuv = assets.geo.uv_coords[assets.geo.uv_faces]
print(f"faces: {assets.geo.faces.shape[0]}", flush=True)


def run(tile, chunk):
    def body(i, g):
        pix, depth = project_points(g + i * 1e-5, K_mat, Rt)
        face, _, dep, uv = rasterize_pallas(
            pix, depth, assets.geo.faces, H, W, tile=tile, chunk=chunk,
            face_uv=fuv, remap_ids=False,
        )
        return jnp.sum(dep[:, ::128, ::128]) + jnp.sum(uv[:, ::128, ::128])

    def runk(g):
        def step(c, i):
            return jnp.float32(body(i, g)), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))[0]

    c = jax.jit(runk)
    float(c(geom))
    t0 = time.time()
    float(c(geom + 0.001))
    print(f"tile={tile} chunk={chunk}: {(time.time()-t0)/K/B*1000:.2f} ms/frame", flush=True)


import itertools, os
CONFIGS = os.environ.get(
    "CONFIGS",
    "32x128x64,32x128x32,32x128x16,16x128x32,16x128x16,8x128x16,64x128x64",
)
for spec in CONFIGS.split(","):
    th, tw, ch = (int(x) for x in spec.split("x"))
    run((th, tw), ch)
