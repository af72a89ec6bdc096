"""Capture a device trace of the conv_decoder stage and dump the top ops.

If the axon tunnel supports device tracing this gives per-HLO-op times; else
the trace will only contain host events (still confirms dispatch overhead).
"""

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

    def sub_conv_decoder(p, motion):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, motion, embs, face_embs,
                method=lambda m, mo, e, f: m.decoder(mo, e, f),
            )["tex_mean_rec"]

    c = jax.jit(sub_conv_decoder)
    out = c(params, motion)
    jax.block_until_ready(out)

    with jax.profiler.trace("/tmp/jax_trace"):
        for _ in range(3):
            out = c(params, motion)
        jax.block_until_ready(out)

    # find the trace json and dump top device ops
    paths = sorted(glob.glob("/tmp/jax_trace/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("NO TRACE FILES — device tracing unsupported here", flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [
        e for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("dur", 0) > 0
    ]
    # pick the process with TPU/device in its name if present
    names = {}
    for e in events:
        nm = e.get("name", "?")
        names[nm] = names.get(nm, 0) + e["dur"]
    top = sorted(names.items(), key=lambda kv: -kv[1])[:40]
    total = sum(names.values())
    for nm, dur in top:
        print(f"{dur/1e3:10.2f} ms  {100*dur/total:5.1f}%  {nm[:110]}", flush=True)


if __name__ == "__main__":
    main()
