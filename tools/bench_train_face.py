"""Face-denoiser training throughput (the second diffusion family).

The face model (nfeats 256, latent 512, reference utils/model_util.py:49-55)
adds a 2-layer rotary pre-encoder whose SELF-attention runs over the ~2000
audio cond tokens — with einsum attention that materialises
[B, H, ~2000, ~2000] f32 logits (~4 GB/layer at bs 64), so the Pallas
attention kernel is load-bearing here, not just faster: measured,
``--no_flash`` at this operating point OOMs 16G HBM by 6.7 GB (22.41G
needed), flash runs it at 1.86 steps/s (a 155k-step face schedule,
README.md:219, in under a day on one chip).  Cached-features operating
point (audio features + lip verts precomputed per scene).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import DenoiserConfig, DiffusionConfig, TrainConfig
from audio2photoreal_tpu.core import rng as rng_util
from audio2photoreal_tpu.diffusion.schedules import make_schedule
from audio2photoreal_tpu.models.audio_encoder import feature_frames
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.train.loops import make_diffusion_train_step
from audio2photoreal_tpu.train.state import create_train_state


def main(B=64, T=600, n_steps=10, flash=True, remat=False):
    cfg = DenoiserConfig(
        data_format="face", nfeats=256, latent_dim=512, ff_size=1024,
        num_layers=8, num_heads=4, max_seq_length=T, dtype="bfloat16",
        remat=remat, flash_attention=flash, frontend_dtype="bfloat16",
    )
    model = FiLMDenoiser(cfg)
    rng = np.random.RandomState(0)
    Ta = feature_frames(T * 1600 // 3)
    batch = {
        "motion": jnp.asarray(rng.randn(B, T, 256).astype(np.float32)),
        "mask": jnp.ones((B, T)),
        "audio_features": jnp.asarray(rng.randn(B, Ta, 1024).astype(np.float32) * 0.5),
        "lip_verts": jnp.asarray(rng.randn(B, T, 1014).astype(np.float32) * 0.1),
    }
    print("init", file=sys.stderr, flush=True)
    init_audio = jnp.zeros((B, T * 1600, 2), jnp.float32)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
        batch["motion"], jnp.zeros((B,), jnp.int32), init_audio,
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M", file=sys.stderr, flush=True)
    state = create_train_state(params, TrainConfig(lr=1e-4))
    step = jax.jit(make_diffusion_train_step(model, make_schedule("cosine", 1000), DiffusionConfig()))
    print("compile train step", file=sys.stderr, flush=True)
    key0 = rng_util.key(2, "rbg")
    state, m = step(state, batch, key0)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = step(state, batch, key0)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / n_steps
    metric = "train_steps_per_sec_face_bs64_T600_cached_features"
    if not remat:
        metric += "_noremat"
    if flash:
        metric += "_flash"
    print(json.dumps({
        "metric": metric, "value": round(1 / dt, 3),
        "unit": "steps_per_sec",
        "vs_baseline": round((1 / dt) * 3600 * 24 / 155_000, 2),
        "note": "vs_baseline = 155k-step face schedules (README.md:219) per day",
    }))


if __name__ == "__main__":
    main(flash="--no_flash" not in sys.argv, remat="--remat" in sys.argv)
