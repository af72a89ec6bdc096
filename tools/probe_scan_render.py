"""Compare per-call vs scan-chained timing of the FULL render path at the
production operating point (B=16 frames/batch, 1024x704, ~12k-face mesh).

The product (render_pipeline) renders whole clips — hundreds of frames — so
chaining several frame-batches into one jitted lax.scan amortises the
per-dispatch tunnel cost that per-call timing pays on every batch.
"""

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


def main(B=16, n_chain=8):
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

    def render(p, motion):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, motion, campos, embs=embs, face_embs_body=face_embs,
                encode=False, render=True, K=K, Rt=Rt, render_display=True,
            )["rgb"]

    # per-call — every timed call sees UNIQUE inputs (the tunnel serves
    # repeated identical dispatches from a result cache)
    rc = jax.jit(render)
    out = rc(params, motion)
    jax.block_until_ready(out)
    variants = [motion + jnp.float32(1e-3 * (i + 1)) for i in range(5)]
    jax.block_until_ready(variants)
    t0 = time.perf_counter()
    outs = [rc(params, m) for m in variants]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 5
    print(f"per-call: {dt*1000/B:.2f} ms/frame ({B/dt:.1f} FPS)", flush=True)

    # scan-chained: n_chain batches inside one jit — motion varies per batch
    def chained(p, ms):
        def body(_, m):
            return None, render(p, m)
        _, outs = jax.lax.scan(body, None, ms)
        return outs

    cc = jax.jit(chained)
    mk = lambda off: jnp.stack([motion + jnp.float32(off + 0.01 * i) for i in range(n_chain)])
    out = cc(params, mk(0.0))
    jax.block_until_ready(out)
    stacks = [mk(1e-3 * (i + 1)) for i in range(3)]
    jax.block_until_ready(stacks)
    t0 = time.perf_counter()
    outs = [cc(params, s) for s in stacks]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 3 / n_chain
    print(f"scan-chained x{n_chain}: {dt*1000/B:.2f} ms/frame ({B/dt:.1f} FPS)", flush=True)


if __name__ == "__main__":
    main()
