"""Device-trace the FULL display-packed render and dump top ops (aggregated
over 3 iterations, B=16, production-scale mesh + seam tables)."""

import glob
import gzip
import json
import sys

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.layers import render_compute_dtype
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig


def main(B=16):
    cfg = RendererConfig(
        uv_size=1024, init_uv_size=64, upscale_size=2048, n_embs=256,
        n_face_embs=256, shadow_size=256, encoder_in_size=512,
        face_tex_size=1024, n_face_verts=512, image_height=1024, image_width=704,
    )
    assets = make_synthetic_assets(cfg, mesh_density=10)
    model = BodyAvatar(cfg, assets)
    motion = jnp.asarray(np.random.RandomState(0).randn(B, 104).astype(np.float32) * 0.1)
    embs = jnp.zeros((B, cfg.n_embs))
    face_embs = jnp.zeros((B, cfg.n_face_embs))
    campos = jnp.asarray(np.tile([0.0, -3.0, 1.0], (B, 1)).astype(np.float32))
    K = jnp.asarray(np.tile([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], (B, 1, 1)).astype(np.float32))
    Rt = jnp.asarray(np.tile([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], (B, 1, 1)).astype(np.float32))

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

    c = jax.jit(full)
    out = c(params, motion)
    jax.block_until_ready(out)

    with jax.profiler.trace("/tmp/jax_trace_full"):
        for i in range(3):
            out = c(params, motion + jnp.float32(0.001 * (i + 1)))
        jax.block_until_ready(out)

    paths = sorted(glob.glob("/tmp/jax_trace_full/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("NO TRACE FILES", flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [
        e for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("dur", 0) > 0
    ]
    names = {}
    for e in events:
        nm = e.get("name", "?")
        if nm.startswith("$") or "block_until" in nm or nm.startswith("jit_"):
            continue
        names[nm] = names.get(nm, 0) + e["dur"]
    top = sorted(names.items(), key=lambda kv: -kv[1])[:45]
    total = sum(names.values())
    print(f"device-op total: {total/1e3:.1f} ms over 3 iters ({total/1e3/3/B:.2f} ms/frame)")
    for nm, dur in top:
        print(f"{dur/1e3/3:9.2f} ms/iter {dur/48e3:7.3f} ms/frame  {nm[:100]}", flush=True)


if __name__ == "__main__":
    main()
