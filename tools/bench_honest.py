"""Measurement discipline for the axon tunnel: identical (executable, args)
dispatches can be coalesced/served from a server-side cache, making repeat
timing loops read near-zero.  Every timing here uses UNIQUE inputs per call,
drains the queue with a scalar fetch before starting, and checks a scalar of
the final output."""

import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np


def timeit_unique(c, make_args, iters=8, tag=""):
    """c: compiled fn; make_args(i) -> args tuple with unique content."""
    out = c(*make_args(-1))
    _ = float(jnp.asarray(out).ravel()[0])  # drain queue
    argsets = [make_args(i) for i in range(iters)]
    jax.block_until_ready(argsets)
    t0 = time.perf_counter()
    outs = [c(*a) for a in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    if tag:
        print(f"{tag}: {dt*1e3:.2f} ms/call", flush=True)
    return dt


def main(B=16):
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
    seed = time.time_ns() % (2**31)
    rng = np.random.RandomState(seed)
    motion = jnp.asarray(rng.randn(B, 104).astype(np.float32) * 0.1)
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

    def full(p, motion):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, motion, campos, embs=embs, face_embs_body=face_embs,
                encode=False, render=True, K=K, Rt=Rt, render_display=True,
            )["rgb"]

    def decode(p, motion):
        with render_compute_dtype(jnp.bfloat16):
            tex = model.apply(
                p, motion, campos, embs=embs, face_embs_body=face_embs,
                encode=False, render=False,
            )["tex_rec"]
            # reduce instead of returning: a [16, 2048, 2048, 3] output copy
            # pads 42x under (8,128) tiling and OOMs 16G HBM by itself
            return jnp.sum(tex.astype(jnp.float32), axis=(1, 2, 3))

    def conv_dec(p, motion):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, motion, embs, face_embs,
                method=lambda m, mo, e, f: m.decoder(mo, e, f),
            )["tex_mean_rec"]

    mk = lambda i: (params, motion + jnp.float32(0.001 * (i + 1)))
    for tag, fn in (("conv_decoder", conv_dec), ("decode(all)", decode), ("FULL", full)):
        c = jax.jit(fn)
        try:
            dt = timeit_unique(c, mk, tag=f"{tag} (B={B})")
        except Exception as e:  # keep later stages measurable
            print(f"{tag} (B={B}): FAILED — {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        print(f"  -> {dt*1e3/B:.2f} ms/frame  ({B/dt:.1f} FPS)", flush=True)


if __name__ == "__main__":
    main()
