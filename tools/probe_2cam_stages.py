"""Per-stage timings of the 2-camera PRODUCT frame (round-5 north star):
decode_frame (view-independent) split into encode / ConvDecoder / shadow,
render_view (per-camera) split into view-UNet / forward_tex / display-pack /
raster — at the production point (B=16, 1024² UV, 2048² tex, 1024×704).

Measurement discipline (NOTES_ROUND3): fresh argument values per timed call,
scalar fetch, K iterations chained in one jit via lax.scan."""
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
campos = jnp.asarray(np.tile([-0.4, -3.0, 1.0], (B, 1)).astype(np.float32))
K_mat = jnp.asarray(np.tile([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], (B, 1, 1)).astype(np.float32))
Rt = jnp.asarray(np.tile([[1, 0, 0, 0.4], [0, 0, -1, 1], [0, 1, 0, 3]], (B, 1, 1)).astype(np.float32))
face_codes = jnp.asarray(rng.randn(B, cfg.n_face_embs).astype(np.float32) * 0.1)
geom0 = assets.lbs.pose(None, motion)

params = jax.jit(
    lambda r: model.init(
        {"params": r}, motion, campos, geom=geom0, face_embs=face_codes,
        encode=True, render=True, K=K_mat, Rt=Rt,
    )
)(jax.random.PRNGKey(0))
params["params"]["decoder"]["verts_conv"]["g"] = (
    params["params"]["decoder"]["verts_conv"]["g"] * 0.02
)


def chain(name, body, *args):
    def run(*a):
        def step(c, i):
            return jnp.float32(body(i, *a)), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))[0]

    c = jax.jit(run)
    float(c(*args))  # warmup + drain
    pert = tuple(
        (x + jnp.asarray(1e-4, x.dtype)) if (hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)) else x
        for x in args
    )
    t0 = time.time()
    float(c(*pert))
    dt = (time.time() - t0) / K / B * 1000
    print(f"{name}: {dt:.2f} ms/frame", flush=True)
    return dt


def sub(x):
    return jnp.sum(x[:, ::64, ::64].astype(jnp.float32)) if x.ndim >= 3 else jnp.sum(x.astype(jnp.float32))


# ---- view-independent (once per product frame) -------------------------
def decode_body(i, m, f):
    with render_compute_dtype(jnp.bfloat16):
        g = assets.lbs.pose(None, m + i * 1e-5)
        preds = model.apply(
            params, m + i * 1e-5, geom=g, face_embs=f, encode=True,
            use_pose_shadow=True, method=BodyAvatar.decode_frame,
        )
        return sub(preds["tex_mean_rec"]) + sub(preds["shadow_seamed"]) + jnp.sum(preds["geom"][:, ::64])


def encode_body(i, m, f):
    with render_compute_dtype(jnp.bfloat16):
        g = assets.lbs.pose(None, m + i * 1e-5)
        enc = model.apply(
            params, g, m + i * 1e-5, f,
            method=lambda mod, gg, mm, ff: mod.encode(gg, mm, ff),
        )
        return jnp.sum(enc["embs"]) + jnp.sum(enc["face_embs"])


def convdec_body(i, m, e, fe):
    with render_compute_dtype(jnp.bfloat16):
        dec = model.apply(
            params, m + i * 1e-5, e + i * 1e-4, fe + i * 1e-4,
            method=lambda mod, mm, ee, ff: mod.decoder(mm, ee, ff),
        )
        return sub(dec["tex_mean_rec"]) + jnp.sum(dec["geom_delta_rec"][:, ::64])


def shadow_body(i, m):
    with render_compute_dtype(jnp.bfloat16):
        sh = model.apply(
            params, m + i * 1e-5,
            method=lambda mod, mm: mod.pose_to_shadow(mm),
        )["shadow_map"]
        return sub(assets.seam_2k.fused_apply(sh, n_resample=2))


# ---- per-view ------------------------------------------------------------
embs0 = jnp.zeros((B, cfg.n_embs))
with render_compute_dtype(jnp.bfloat16):
    decoded0 = model.apply(
        params, motion, geom=geom0, face_embs=face_codes, encode=True,
        use_pose_shadow=True, method=BodyAvatar.decode_frame,
    )
decoded0 = {k: decoded0[k] for k in ("geom", "tex_mean_rec", "shadow_seamed")}
jax.block_until_ready(decoded0)


def view_body(i, d, cpos, Km, R):
    with render_compute_dtype(jnp.bfloat16):
        dd = {k: v + i.astype(v.dtype) * jnp.asarray(1e-5, v.dtype) for k, v in d.items()}
        out = model.apply(
            params, dd, cpos, Km, R, render_display=True,
            method=BodyAvatar.render_view,
        )
        return sub(out["rgb"])


def view_unet_body(i, g, tmr):
    with render_compute_dtype(jnp.bfloat16):
        out = model.apply(
            params, g + i * 1e-5, tmr + i.astype(tmr.dtype) * jnp.asarray(1e-4, tmr.dtype), campos,
            method=lambda m, gg, t, c: m.decoder_view(gg, t, c),
        )
        return sub(out["tex_view_rec"])


def forward_tex_body(i, tmr, tvr, sh):
    with render_compute_dtype(jnp.bfloat16):
        t = model.apply(
            params,
            tmr + i.astype(tmr.dtype) * jnp.asarray(1e-4, tmr.dtype),
            tvr, None,
            method=lambda m, a, bb, c: m.forward_tex(a, bb, c, final_seam=False,
                                                     shadow_seamed=sh),
        )
        return sub(t)


from audio2photoreal_tpu.ops.gridsample import pack_rgb8
from audio2photoreal_tpu.render.color import linear2display_batch
from audio2photoreal_tpu.render.geometry import project_points
from audio2photoreal_tpu.render.rasterizer import render_mesh


def display_raster_body(i, tex, g):
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
        return sub(rgb)


tex_rec0 = decoded0["tex_mean_rec"]
tvr0 = jnp.asarray(rng.randn(B, 1024, 1024, 3).astype(np.float32) * 0.1, jnp.bfloat16)
tex2k0 = jnp.asarray(rng.rand(B, 2048, 2048, 3).astype(np.float32), jnp.bfloat16)

print(f"== view-independent (once per product frame), B={B} ==")
d_dec = chain("decode_frame total", decode_body, motion, face_codes)
d_enc = chain("  encode (face translation + body enc)", encode_body, motion, face_codes)
d_cd = chain("  conv_decoder", convdec_body, motion, embs0, jnp.zeros((B, cfg.n_face_embs)))
d_sh = chain("  pose_to_shadow + seam", shadow_body, motion)
print(f"== per-view (x n_cams) ==")
d_view = chain("render_view total", view_body, decoded0, campos, K_mat, Rt)
d_vu = chain("  view_unet", view_unet_body, decoded0["geom"], decoded0["tex_mean_rec"])
d_ft = chain("  forward_tex (shadow preseamed)", forward_tex_body,
             decoded0["tex_mean_rec"], tvr0, decoded0["shadow_seamed"])
d_dr = chain("  display+pack+seam+raster+gather", display_raster_body, tex2k0, geom0)
print(f"\nproduct frame (2 cams): {d_dec + 2 * d_view:.2f} ms -> {1000 / (d_dec + 2 * d_view):.2f} FPS")
