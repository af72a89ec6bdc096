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
    # production-scale mesh: ~12k small triangles like the real body topology
    assets = make_synthetic_assets(cfg, mesh_density=10)
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
    # a RANDOM-init decoder emits O(0.5m) vertex deltas that scatter the mesh
    # across the whole frame — unrepresentative of a trained model (deltas are
    # centimeters) and pathological for any tiled rasterizer.  Scale the verts
    # head down so the benchmark rasterizes a coherent body-like mesh.
    params = jax.tree_util.tree_map(lambda x: x, params)  # unfreeze-safe copy
    params["params"]["decoder"]["verts_conv"]["g"] = (
        params["params"]["decoder"]["verts_conv"]["g"] * 0.02
    )

    from audio2photoreal_tpu.render.layers import render_compute_dtype

    def render(p, motion, campos, K, Rt, embs, face_embs):
        # display-packed fast path — the production video pipeline
        # (render_texture_packed: single-channel int32 texture gathers)
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, motion, campos, embs=embs, face_embs_body=face_embs,
                encode=False, render=True, K=K, Rt=Rt, render_display=True,
            )["rgb"]

    def stage_decode(p, motion, campos, K, Rt, embs, face_embs):
        with render_compute_dtype(jnp.bfloat16):
            preds = model.apply(
                p, motion, campos, embs=embs, face_embs_body=face_embs,
                encode=False, render=False,
            )
        return preds["tex_rec"], preds["geom"]

    def time_fn(fn, *args, tag=""):
        # NOTE: each timed call must see UNIQUE input data — the device
        # tunnel can coalesce/cache identical (executable, args) dispatches,
        # which makes repeat-timing loops read near-zero
        c = jax.jit(fn)
        out = c(*args)
        jax.block_until_ready(out)
        variants = []
        for i in range(n_runs):
            eps = jnp.float32(1e-3 * (i + 1))
            variants.append(
                tuple(
                    a + eps.astype(a.dtype) if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a
                    for a in args
                )
            )
        jax.block_until_ready(variants)
        t0 = time.perf_counter()
        outs = [c(*v) for v in variants]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n_runs
        print(f"stage {tag}: {dt*1000/B:.1f} ms/frame", file=sys.stderr, flush=True)
        return c, dt

    print("compile decode stage", file=sys.stderr, flush=True)
    dec_c, dt_dec = time_fn(stage_decode, params, motion, campos, K, Rt, embs,
                            face_embs, tag="decode(no render)")
    tex_rec, geom = dec_c(params, motion, campos, K, Rt, embs, face_embs)

    # decode sub-stages
    def sub_conv_decoder(p, motion, embs, face_embs):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, motion, embs, face_embs,
                method=lambda m, mo, e, f: m.decoder(mo, e, f),
            )["tex_mean_rec"]

    def sub_view_unet(p, geom, tex, campos):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, geom, tex, campos,
                method=lambda m, g, t, c: m.decoder_view(g, t, c),
            )["tex_view_rec"]

    def sub_shadow(p, motion):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, motion, method=lambda m, mo: m.pose_to_shadow(mo)
            )["shadow_map"]

    def sub_forward_tex(p, tex_mean, tex_view, shadow):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, tex_mean, tex_view, shadow, method=BodyAvatar.forward_tex
            )

    tm = jax.jit(sub_conv_decoder)(params, motion, embs, face_embs)
    time_fn(sub_conv_decoder, params, motion, embs, face_embs, tag="  conv_decoder")
    tv = jax.jit(sub_view_unet)(params, geom, tm, campos)
    time_fn(sub_view_unet, params, geom, tm, campos, tag="  view_unet")
    sh = jax.jit(sub_shadow)(params, motion)
    time_fn(sub_shadow, params, motion, tag="  pose_shadow")
    time_fn(sub_forward_tex, params, tm, tv, sh, tag="  forward_tex")

    from audio2photoreal_tpu.render.color import linear2display_batch
    from audio2photoreal_tpu.render.geometry import project_points
    from audio2photoreal_tpu.render.rasterizer import (
        interpolate_uv,
        rasterize,
        render_texture,
        render_texture_packed,
    )

    def stage_raster(geom, K, Rt):
        pix, depth = project_points(geom, K, Rt)
        return rasterize(pix, depth, assets.geo.faces, cfg.image_height, cfg.image_width)

    rast_c, dt_rast = time_fn(stage_raster, geom, K, Rt, tag="rasterize")
    raster = rast_c(geom, K, Rt)
    uv_c, _ = time_fn(
        lambda r: interpolate_uv(r, assets.geo.uv_coords, assets.geo.uv_faces),
        raster, tag="interpolate_uv",
    )
    uv_pix = uv_c(raster)
    time_fn(lambda t: linear2display_batch(t.astype(jnp.float32)), tex_rec,
            tag="linear2display 2048²")

    _, dt_tex_f32 = time_fn(
        lambda r, uv, t: render_texture(r, uv, t), raster, uv_pix, tex_rec,
        tag="texture f32 gather",
    )
    tex_disp = jax.jit(linear2display_batch)(tex_rec.astype(jnp.float32))
    _, dt_tex_packed = time_fn(
        lambda r, uv, t: render_texture_packed(r, uv, t), raster, uv_pix, tex_disp,
        tag="texture quad-rgb8 gather (incl. quad build)",
    )
    from audio2photoreal_tpu.ops.gridsample import (
        grid_sample_bilinear_quad,
        make_quad_texture,
        pack_rgb8,
    )

    quad = jax.jit(lambda t: make_quad_texture(pack_rgb8(t)))(tex_disp)
    _, dt_gather_only = time_fn(
        lambda uv, q: grid_sample_bilinear_quad(q, uv * 2.0 - 1.0),
        uv_pix, quad, tag="quad gather only",
    )

    print("compile full render (display-packed)", file=sys.stderr, flush=True)
    rc = jax.jit(render)
    out = rc(params, motion, campos, K, Rt, embs, face_embs)
    jax.block_until_ready(out)

    motions = [motion + jnp.float32(1e-3 * (i + 1)) for i in range(n_runs)]
    jax.block_until_ready(motions)
    t0 = time.perf_counter()
    outs = [rc(params, m, campos, K, Rt, embs, face_embs) for m in motions]
    jax.block_until_ready(outs)
    wall = (time.perf_counter() - t0) / n_runs
    fps = B / wall
    print(
        json.dumps(
            {"metric": "render_fps_1024x704_uv1024", "value": round(fps, 2),
             "unit": "frames_per_sec", "vs_baseline": round(fps / 30.0, 3)}
        )
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frame_batch", type=int, default=4)
    ap.add_argument("--n_runs", type=int, default=5)
    args = ap.parse_args()
    main(frame_batch=args.frame_batch, n_runs=args.n_runs)
