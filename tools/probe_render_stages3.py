"""Round-3 per-stage render timings at the production point (B=16,
1024² UV / 2048² tex / 1024×704 image, ~9.3k faces).

Measurement discipline (NOTES_ROUND3): every timed call gets FRESH argument
values and a scalar fetch; K iterations chained in one jit via lax.scan."""
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
campos = jnp.asarray(np.tile([0.0, -3.0, 1.0], (B, 1)).astype(np.float32))
K_mat = jnp.asarray(np.tile([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], (B, 1, 1)).astype(np.float32))
Rt = jnp.asarray(np.tile([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], (B, 1, 1)).astype(np.float32))
embs = jnp.zeros((B, cfg.n_embs))
face_embs = jnp.zeros((B, cfg.n_face_embs))

params = jax.jit(
    lambda r: model.init(
        {"params": r}, motion, campos, embs=embs, face_embs_body=face_embs,
        encode=False, render=True, K=K_mat, Rt=Rt,
    )
)(jax.random.PRNGKey(0))

tex_rec = jnp.asarray(rng.rand(B, 2048, 2048, 3).astype(np.float32), jnp.bfloat16)
tex_mean_rec = jnp.asarray(rng.randn(B, 1024, 1024, 3).astype(np.float32) * 0.1, jnp.bfloat16)
tex_view_rec = jnp.asarray(rng.randn(B, 1024, 1024, 3).astype(np.float32) * 0.1, jnp.bfloat16)
shadow_map = jnp.asarray(rng.rand(B, 2048, 2048, 1).astype(np.float32), jnp.bfloat16)
# realistic coherent geometry: the posed template (+ small noise), not randn —
# random verts make screen-sized triangles and the raster cost explodes
geom = assets.lbs.pose(None, motion) + jnp.asarray(
    rng.randn(B, int(assets.geo.faces.max()) + 1, 3).astype(np.float32) * 1e-3
)


def chain(name, body, *args):
    """body(i_float, *args) -> scalar; scan K times with i varying."""
    def run(*a):
        def step(c, i):
            return jnp.float32(body(i, *a)), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))[0]

    c = jax.jit(run)
    float(c(*args))  # warmup + drain
    pert = tuple(
        (x + jnp.asarray(0.25, x.dtype)) if jnp.issubdtype(x.dtype, jnp.floating) else x
        for x in args
    )
    t0 = time.time()
    v = float(c(*pert))
    dt = (time.time() - t0) / K / B * 1000
    print(f"{name}: {dt:.2f} ms/frame", flush=True)
    return dt


from audio2photoreal_tpu.ops.gridsample import pack_rgb8
from audio2photoreal_tpu.render.color import linear2display_batch
from audio2photoreal_tpu.render.geometry import project_points
from audio2photoreal_tpu.render.rasterizer import render_mesh
from audio2photoreal_tpu.ops.pallas_raster import rasterize_pallas

fuv = assets.geo.uv_coords[assets.geo.uv_faces]


def tail_body(i, tex, g):
    # display transform -> pack -> packed seam -> project -> raster+gather
    with render_compute_dtype(jnp.bfloat16):
        t = tex + i.astype(tex.dtype) * jnp.asarray(1e-4, tex.dtype)
        packed = pack_rgb8(linear2display_batch(t.astype(jnp.float32)))
        packed = assets.seam_2k.fused_apply_packed(packed, 2)
        pix, depth = project_points(g + i * 1e-5, K_mat, Rt)
        rgb, _ = render_mesh(
            pix, depth, assets.geo.faces, assets.geo.uv_coords,
            assets.geo.uv_faces, t, cfg.image_height, cfg.image_width,
            packed_display=True, texture_packed=packed,
        )
        return jnp.sum(rgb[:, ::128, ::128].astype(jnp.float32))


def raster_body(i, g):
    pix, depth = project_points(g + i * 1e-5, K_mat, Rt)
    face, _, dep, uv = rasterize_pallas(
        pix, depth, assets.geo.faces, cfg.image_height, cfg.image_width,
        face_uv=fuv, remap_ids=False,
    )
    return jnp.sum(dep[:, ::128, ::128]) + jnp.sum(uv[:, ::128, ::128])


def display_pack_body(i, tex):
    t = tex + i.astype(tex.dtype) * jnp.asarray(1e-4, tex.dtype)
    packed = pack_rgb8(linear2display_batch(t.astype(jnp.float32)))
    packed = assets.seam_2k.fused_apply_packed(packed, 2)
    return jnp.sum(packed[:, ::128, ::128].astype(jnp.float32))


def view_unet_body(i, g, tmr):
    with render_compute_dtype(jnp.bfloat16):
        out = model.apply(
            params, g + i * 1e-5, tmr + i.astype(tmr.dtype) * jnp.asarray(1e-4, tmr.dtype), campos,
            method=lambda m, gg, t, c: m.decoder_view(gg, t, c),
        )
        return jnp.sum(out["tex_view_rec"][:, ::128, ::128].astype(jnp.float32))


def shadow_body(i, m):
    with render_compute_dtype(jnp.bfloat16):
        out = model.apply(
            params, m + i * 1e-4, method=lambda mo, mm: mo.pose_to_shadow(mm)
        )
        return jnp.sum(out["shadow_map"][:, ::128, ::128].astype(jnp.float32))


def ftex_body(i, tm, tv, sh):
    with render_compute_dtype(jnp.bfloat16):
        eps = i.astype(tm.dtype) * jnp.asarray(1e-4, tm.dtype)
        out = model.apply(
            params, tm + eps, tv + eps, sh,
            method=lambda m, a, b, c: m.forward_tex(a, b, c, final_seam=False),
        )
        return jnp.sum(out[:, ::128, ::128].astype(jnp.float32))


chain("raster_only(+project)", raster_body, geom)
chain("display+pack+packed_seam", display_pack_body, tex_rec)
chain("render_tail(display+raster+gather)", tail_body, tex_rec, geom)
chain("view_unet", view_unet_body, geom, tex_mean_rec)
chain("pose_to_shadow", shadow_body, motion)
chain("forward_tex(no final seam)", ftex_body, tex_mean_rec, tex_view_rec, shadow_map)
