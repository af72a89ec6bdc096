"""Geometry sensitivity of the render bench (VERDICT r4 weak #5).

`bench.py::_render_fps` measures FPS on synthetic assets with the verts head
scaled ×0.02 so random-init deltas don't scatter the mesh — but the Pallas
raster cost depends on triangle/tile occupancy, so the number could be a
synthetic-geometry artifact.  This probe sweeps delta scale × camera distance
on the same rig and reports the FPS spread.

Run:  python tools/probe_render_geometry_sweep.py
"""

import itertools
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp

from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.layers import render_compute_dtype
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig


def main(B=16, n_runs=3):
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

    def make_cams(dist):
        campos = jnp.asarray(np.tile([0.0, -dist, 1.0], (B, 1)).astype(np.float32))
        Kc = jnp.asarray(np.tile(
            [[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], (B, 1, 1)).astype(np.float32))
        Rt = jnp.asarray(np.tile(
            [[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, dist]], (B, 1, 1)).astype(np.float32))
        return campos, Kc, Rt

    campos0, K0, Rt0 = make_cams(3.0)
    base = jax.jit(
        lambda r: model.init(
            {"params": r}, motion, campos0, embs=embs, face_embs_body=face_embs,
            encode=False, render=True, K=K0, Rt=Rt0,
        )
    )(jax.random.PRNGKey(0))
    g0 = base["params"]["decoder"]["verts_conv"]["g"]

    def render(p, m, campos, Kc, Rt):
        with render_compute_dtype(jnp.bfloat16):
            return model.apply(
                p, m, campos, embs=embs, face_embs_body=face_embs,
                encode=False, render=True, K=Kc, Rt=Rt, render_display=True,
            )["rgb"]

    rc = jax.jit(render)
    results = {}
    for scale, dist in itertools.product((0.005, 0.02, 0.05, 0.1), (2.0, 3.0, 5.0)):
        params = jax.tree_util.tree_map(lambda x: x, base)
        params["params"]["decoder"]["verts_conv"]["g"] = g0 * scale
        campos, Kc, Rt = make_cams(dist)
        out = rc(params, motion, campos, Kc, Rt)
        cov = float((np.asarray(out).sum(-1) > 0).mean())
        jax.block_until_ready(out)
        motions = [motion + jnp.float32(1e-3 * (i + 1)) for i in range(n_runs)]
        jax.block_until_ready(motions)
        t0 = time.perf_counter()
        outs = [rc(params, m, campos, Kc, Rt) for m in motions]
        jax.block_until_ready(outs)
        fps = B * n_runs / (time.perf_counter() - t0)
        results[(scale, dist)] = (fps, cov)
        print(f"delta_scale {scale:<6} cam_dist {dist:<4} -> {fps:6.2f} FPS "
              f"(px coverage {100 * cov:.1f}%)")
    fpss = [v[0] for v in results.values()]
    print(f"\nspread: min {min(fpss):.2f}  max {max(fpss):.2f}  "
          f"rel {100 * (max(fpss) - min(fpss)) / max(fpss):.1f}%  "
          f"(bench point: scale 0.02, dist 3.0 = {results[(0.02, 3.0)][0]:.2f})")


if __name__ == "__main__":
    main()
