"""Cost-analysis of each render stage: FLOPs, bytes, and achieved vs v5e
peak — locates the true wall (MXU-bound vs HBM-bound vs overhead)."""

import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.layers import render_compute_dtype
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

V5E_PEAK = 197e12
V5E_HBM = 819e9  # bytes/s


def main(B=16):
    cfg = RendererConfig(
        uv_size=1024, init_uv_size=64, upscale_size=2048, n_embs=256,
        n_face_embs=256, shadow_size=256, encoder_in_size=512,
        face_tex_size=1024, n_face_verts=512, image_height=1024, image_width=704,
    )
    assets = make_synthetic_assets(cfg, mesh_density=10)
    model = BodyAvatar(cfg, assets)
    motion = jnp.asarray(np.random.RandomState(0).randn(B, 104).astype(np.float32) * 0.1)
    campos = jnp.asarray(np.tile([0.0, -3.0, 1.0], (B, 1)).astype(np.float32))
    K = jnp.asarray(np.tile([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], (B, 1, 1)).astype(np.float32))
    Rt = jnp.asarray(np.tile([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], (B, 1, 1)).astype(np.float32))
    embs = jnp.zeros((B, cfg.n_embs))
    face_embs = jnp.zeros((B, cfg.n_face_embs))

    params = jax.jit(
        lambda r: model.init(
            {"params": r}, motion, campos, embs=embs, face_embs_body=face_embs,
            encode=False, render=True, K=K, Rt=Rt,
        )
    )(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["params"]["decoder"]["verts_conv"]["g"] = (
        params["params"]["decoder"]["verts_conv"]["g"] * 0.02
    )

    def report(name, fn, *args, iters=4):
        c = jax.jit(fn)
        lowered = c.lower(*args)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
        out = c(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = c(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        mfu = flops / dt / V5E_PEAK
        hbm = bytes_ / dt / V5E_HBM
        print(
            f"{name:28s} {dt*1e3/B:7.2f} ms/f  {flops/B/1e9:8.2f} GF/f "
            f"{bytes_/B/1e6:8.1f} MB/f  MFU {mfu*100:5.1f}%  HBM {hbm*100:5.1f}%",
            flush=True,
        )
        return out

    def stage_decode(p, motion):
        with render_compute_dtype(jnp.bfloat16):
            preds = model.apply(
                p, motion, campos, embs=embs, face_embs_body=face_embs,
                encode=False, render=False,
            )
        return preds["tex_rec"], preds["geom"]

    def sub_conv_decoder(p, motion):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, motion, embs, face_embs,
                method=lambda m, mo, e, f: m.decoder(mo, e, f),
            )["tex_mean_rec"]

    def sub_view_unet(p, geom, tex):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, geom, tex, campos,
                method=lambda m, g, t, c: m.decoder_view(g, t, c),
            )["tex_view_rec"]

    def sub_forward_tex(p, tm, tv, sh):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(p, tm, tv, sh, method=BodyAvatar.forward_tex)

    def sub_shadow(p, motion):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(p, motion, method=lambda m, mo: m.pose_to_shadow(mo))["shadow_map"]

    tex_rec, geom = report("decode(all)", stage_decode, params, motion)
    tm = report("conv_decoder", sub_conv_decoder, params, motion)
    tv = report("view_unet", sub_view_unet, params, geom, tm)
    sh = report("pose_shadow", sub_shadow, params, motion)
    report("forward_tex", sub_forward_tex, params, tm, tv, sh)

    def full(p, motion):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, motion, campos, embs=embs, face_embs_body=face_embs,
                encode=False, render=True, K=K, Rt=Rt, render_display=True,
            )["rgb"]

    report("FULL render", full, params, motion)


if __name__ == "__main__":
    main()
