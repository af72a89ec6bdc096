"""Training-throughput benchmark on the real chip.

Measures the flagship pose-denoiser train step (forward+backward+AdamW,
bf16 compute / f32 params) at the reference's default batch 64 and the
600-frame window (reference trains at lr 1e-4 bs 64 on one GPU,
utils/diff_parser_utils.py:188,208-212) — the number that sets wall-clock for
the 800k-step schedule.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import DenoiserConfig, DiffusionConfig, TrainConfig
from audio2photoreal_tpu.diffusion.schedules import make_schedule
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.train.loops import make_diffusion_train_step
from audio2photoreal_tpu.train.state import create_train_state


def main(B=64, T=600, n_steps=10, cached_features=False, remat=True, flash=False):
    cfg = DenoiserConfig(
        data_format="pose", nfeats=104, latent_dim=256, ff_size=1024,
        num_layers=8, num_heads=4, max_seq_length=T, dtype="bfloat16",
        remat=remat,
        # Pallas attention incl. in-kernel dropout (ops/pallas/flash.py)
        flash_attention=flash,  # raw-audio path at bs64×600 needs remat on 16G HBM;
        # with cached features the frontend leaves the graph and remat=False
        # fits — and skips the whole forward recompute in the backward
        # frozen frontend in bf16 (f32 accumulation): the f32 frontend is
        # 364 ms of the 1063 ms step (probe_train_stages) at ~7% MFU
        frontend_dtype="bfloat16",
    )
    model = FiLMDenoiser(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng.randn(B, T, 104).astype(np.float32)),
        "mask": jnp.ones((B, T)),
        "audio": jnp.asarray(rng.randn(B, T * 1600, 2).astype(np.float32) * 0.1),
        "keyframes": jnp.asarray(rng.randn(B, T // 30, 104).astype(np.float32)),
        "keyframe_valid": jnp.ones((B, T // 30)),
    }
    print("init", file=sys.stderr, flush=True)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
        batch["motion"], jnp.zeros((B,), jnp.int32), batch["audio"],
        batch["keyframes"], batch["keyframe_valid"],
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M", file=sys.stderr, flush=True)
    if cached_features:
        # feature-cache operating point (data/feature_cache.py): the frozen
        # wav2vec frontend leaves the step entirely
        from audio2photoreal_tpu.models.audio_encoder import feature_frames

        Ta = feature_frames(T * 1600 // 3)
        del batch["audio"]
        batch["audio_features"] = jnp.asarray(
            rng.randn(B, Ta, 1024).astype(np.float32) * 0.5
        )
    state = create_train_state(params, TrainConfig(lr=1e-4))
    step = jax.jit(make_diffusion_train_step(model, make_schedule("cosine", 1000), DiffusionConfig()))
    print("compile train step", file=sys.stderr, flush=True)
    # rbg step keys — the trainers' default (TrainConfig.rng_impl): threefry
    # spends ~125 ms/step computing the ~3.6B dropout draws on the VPU
    from audio2photoreal_tpu.core import rng as rng_util

    key0 = rng_util.key(2, "rbg")
    # ONE base key: the step folds state.step in internally (train/loops.py).
    # An eager per-step fold_in/split is its own tiny device execution, and
    # through the device tunnel that serializes the loop (2.6 -> 0.67 steps/s)
    state, m = step(state, batch, key0)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = step(state, batch, key0)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / n_steps
    # achieved FLOPs/s vs v5e bf16 peak (197 TFLOP/s) — best effort
    mfu = None
    try:
        ca = step.lower(state, batch, key0).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = flops / dt / 197e12
    except Exception as e:  # pragma: no cover
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    metric = "train_steps_per_sec_pose_bs64_T600"
    if cached_features:
        metric += "_cached_features"
    if not remat:
        metric += "_noremat"
    if flash:
        metric += "_flash"
    result = {
        "metric": metric, "value": round(1 / dt, 3),
        "unit": "steps_per_sec", "vs_baseline": round((1 / dt) * 3600 * 24 / 800_000, 2),
        "note": "vs_baseline = 800k-step schedules completable per day",
    }
    if mfu is not None:
        result["mfu_vs_v5e_bf16_peak"] = round(mfu, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main(
        cached_features="--cache_audio_features" in sys.argv,
        remat="--no_remat" not in sys.argv,
        flash="--flash" in sys.argv,
    )
