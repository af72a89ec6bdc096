"""2cam product batch-shape experiments: frame batch F in {16, 24, 32} and
one fused 2F-row view dispatch vs two F-row dispatches."""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np
from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.layers import render_compute_dtype
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

cfg = RendererConfig(
    uv_size=1024, init_uv_size=64, upscale_size=2048, n_embs=256,
    n_face_embs=256, shadow_size=256, encoder_in_size=512,
    face_tex_size=1024, n_face_verts=512, image_height=1024, image_width=704,
)
assets = make_synthetic_assets(cfg, mesh_density=10)
model = BodyAvatar(cfg, assets)
rng = np.random.RandomState(0)
CAMS = [
    (np.array([-0.4, -3.0, 1.0], np.float32),
     np.array([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], np.float32),
     np.array([[1, 0, 0, 0.4], [0, 0, -1, 1], [0, 1, 0, 3]], np.float32)),
    (np.array([0.4, -3.0, 1.0], np.float32),
     np.array([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], np.float32),
     np.array([[1, 0, 0, -0.4], [0, 0, -1, 1], [0, 1, 0, 3]], np.float32)),
]
_KEYS = ("geom", "tex_mean_rec", "shadow_seamed")

def build(F):
    motion = jnp.asarray(rng.randn(F, 104).astype(np.float32) * 0.1)
    face_codes = jnp.asarray(rng.randn(F, cfg.n_face_embs).astype(np.float32) * 0.1)
    cam_args = [
        (jnp.asarray(np.tile(p, (F, 1))), jnp.asarray(np.tile(Kc, (F, 1, 1))),
         jnp.asarray(np.tile(Rt, (F, 1, 1))))
        for p, Kc, Rt in CAMS
    ]
    geom0 = assets.lbs.pose(None, motion)
    params = jax.jit(
        lambda r: model.init(
            {"params": r}, motion, cam_args[0][0], geom=geom0,
            face_embs=face_codes, encode=True, render=True,
            K=cam_args[0][1], Rt=cam_args[0][2],
        )
    )(jax.random.PRNGKey(0))
    params["params"]["decoder"]["verts_conv"]["g"] = params["params"]["decoder"]["verts_conv"]["g"] * 0.02
    embs1 = jax.jit(lambda p: model.apply(p, method=BodyAvatar.template_body_embs))(params)
    def decode(p, m, f, e1):
        with render_compute_dtype(jnp.bfloat16):
            embs = jnp.broadcast_to(e1, (m.shape[0], e1.shape[-1]))
            preds = model.apply(p, m, face_embs=f, embs=embs, encode=False,
                                use_pose_shadow=True, method=BodyAvatar.decode_frame)
        return {k: preds[k] for k in _KEYS}
    def view(p, d, cpos, Kc, Rt):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(p, d, cpos, Kc, Rt, render_display=True,
                               method=BodyAvatar.render_view)["rgb"]
    return params, embs1, motion, face_codes, cam_args, jax.jit(decode), jax.jit(view)

def timeit(F, fused, n_runs=3):
    params, embs1, motion, face_codes, cam_args, decode_c, view_c = build(F)
    if fused:
        cpos = jnp.concatenate([cam_args[0][0], cam_args[1][0]], 0)
        Kc = jnp.concatenate([cam_args[0][1], cam_args[1][1]], 0)
        Rt = jnp.concatenate([cam_args[0][2], cam_args[1][2]], 0)
    d0 = decode_c(params, motion, face_codes, embs1)
    if fused:
        d2 = {k: jnp.concatenate([v, v], 0) for k, v in d0.items()}
        out = view_c(params, d2, cpos, Kc, Rt)
        jax.block_until_ready(out)
    else:
        outs = [view_c(params, d0, *ca) for ca in cam_args]
        jax.block_until_ready(outs)
    motions = [motion + jnp.float32(1e-3 * (i + 1)) for i in range(n_runs)]
    jax.block_until_ready(motions)
    t0 = time.perf_counter()
    res = []
    for m in motions:
        d = decode_c(params, m, face_codes, embs1)
        if fused:
            d2 = {k: jnp.concatenate([v, v], 0) for k, v in d.items()}
            res.append(view_c(params, d2, cpos, Kc, Rt))
        else:
            res.append([view_c(params, d, *ca) for ca in cam_args])
    jax.block_until_ready(res)
    fps = F * n_runs / (time.perf_counter() - t0)
    print(f"F={F:<3} fused={int(fused)}: {fps:6.2f} product FPS ({1000/fps:.1f} ms/frame)", flush=True)

for F in (16, 24, 32):
    try:
        timeit(F, False)
    except Exception as e:
        print(f"F={F}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
timeit(16, True)
