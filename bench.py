"""Headline benchmark: seconds of audio converted to motion per wall-clock
second on one chip (the BASELINE.md north star; >1.0 = faster than realtime).

Pipeline measured = the reference's flagship inference path
(sample/generate.py:271-316): guide-transformer keyframe generation + body
diffusion with DDIM + classifier-free guidance at the published operating
point (ddim500 × 2 CFG branches, README.md:249) — re-architected so the
conditioning encoder runs ONCE and the whole denoise loop is a single
compiled scan with batched CFG.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from audio2photoreal_tpu.core.config import DenoiserConfig, DiffusionConfig, GuideConfig
    from audio2photoreal_tpu.diffusion import sampling
    from audio2photoreal_tpu.diffusion.respace import maybe_respaced
    from audio2photoreal_tpu.models.cfg import cfg_model_fn
    from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
    from audio2photoreal_tpu.models.guide import GuideTransformer

    T = 600  # 20 s of motion at 30 fps — the reference max window
    AUDIO_SECS = T / 30.0
    B = 1
    cfg = DenoiserConfig(
        data_format="pose", nfeats=104, latent_dim=256, ff_size=1024,
        num_layers=8, num_heads=4, max_seq_length=T,
    )
    dcfg = DiffusionConfig(timestep_respacing="ddim500")
    gcfg = GuideConfig(tokens=1024, latent_dim=512, ff_size=1024, num_layers=6,
                       num_heads=4, vq_depth=4)

    model = FiLMDenoiser(cfg)
    guide = GuideTransformer(gcfg)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, cfg.nfeats))
    t0 = jnp.zeros((B,), jnp.int32)
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T * 1600, 2)) * 0.1
    K = T // 30
    kf = jax.random.normal(jax.random.PRNGKey(2), (B, K, 104))
    kv = jnp.ones((B, K))
    # jit the inits: eager init dispatches thousands of tiny ops through the
    # device tunnel (~2 min); jitted it is one executable (~seconds)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(3)}, x, t0, audio, kf, kv)
    gtokens = jnp.zeros((B, 4), jnp.int32)
    gparams = jax.jit(guide.init)({"params": jax.random.PRNGKey(4)}, gtokens, audio)

    sched = maybe_respaced(dcfg.schedule, dcfg.steps, dcfg.timestep_respacing)

    @jax.jit
    def pipeline(audio, kf, kv, xT, key):
        k1, k2 = jax.random.split(key)
        # guide tokens (K keyframes × depth 4) — generated, then we condition
        # the denoiser on the (given) keyframes like generate._replace_keyframes
        tokens = guide.apply(gparams, audio, K * 4, k1, method=GuideTransformer.generate)
        cond = model.apply(params, audio, kf, kv, method=FiLMDenoiser.encode_conditioning)

        def apply_fn(p, xx, tt, cc, keep):
            return model.apply(p, xx, tt, cc, keep, method=FiLMDenoiser.denoise)

        mf = cfg_model_fn(apply_fn, params, cond, guidance_scale=2.0)
        res = sampling.ddim_sample_loop(sched, dcfg.predict, mf, xT, k2)
        return res.pred_xstart, tokens

    xT = jax.random.normal(jax.random.PRNGKey(5), x.shape)
    # compile
    out, tokens = pipeline(audio, kf, kv, xT, jax.random.PRNGKey(6))
    jax.block_until_ready(out)
    # timed runs
    n_runs = 3
    t_start = time.perf_counter()
    for i in range(n_runs):
        out, tokens = pipeline(audio, kf, kv, xT, jax.random.PRNGKey(7 + i))
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t_start) / n_runs

    value = AUDIO_SECS / wall
    # baseline anchor: the reference offers no published throughput; realtime
    # (1.0× on one chip, BASELINE.md north star) is the bar
    print(
        json.dumps(
            {
                "metric": "audio_secs_per_wall_sec_pose_ddim500_cfg",
                "value": round(value, 3),
                "unit": "x_realtime",
                "vs_baseline": round(value / 1.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
