"""Stage split of the cached-features no-remat train step (the 2.02 steps/s
operating point).  Honest-timing rules: scan-chain K iters in ONE jit, thread
the carry so nothing dead-codes, fetch a scalar with FRESH args."""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import DenoiserConfig, DiffusionConfig, TrainConfig
from audio2photoreal_tpu.diffusion.schedules import make_schedule
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.models.audio_encoder import feature_frames
from audio2photoreal_tpu.train.loops import make_diffusion_train_step
from audio2photoreal_tpu.train.state import create_train_state

B, T, K = 64, 600, 4

cfg = DenoiserConfig(
    data_format="pose", nfeats=104, latent_dim=256, ff_size=1024,
    num_layers=8, num_heads=4, max_seq_length=T, dtype="bfloat16",
    remat=False, frontend_dtype="bfloat16",
)
model = FiLMDenoiser(cfg)
rng = np.random.RandomState(0)
Ta = feature_frames(T * 1600 // 3)
batch = {
    "motion": jnp.asarray(rng.randn(B, T, 104).astype(np.float32) * 0.1),
    "mask": jnp.ones((B, T), jnp.float32),
    "audio_features": jnp.asarray(rng.randn(B, Ta, 1024).astype(np.float32) * 0.5),
    "keyframes": jnp.asarray(rng.randn(B, 20, 104).astype(np.float32) * 0.1),
    "keyframe_valid": jnp.ones((B, 20), jnp.float32),
}
init_audio = jnp.zeros((B, T * 1600, 2), jnp.float32)
params = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
    batch["motion"], jnp.zeros((B,), jnp.int32), init_audio,
    batch["keyframes"], batch["keyframe_valid"],
)
n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"params: {n_params/1e6:.1f}M", flush=True)


def chain(name, body):
    """body(carry_scalar, params, batch, i) -> scalar (must depend on the
    heavy compute so nothing dead-codes)."""
    f = jax.jit(lambda p, b: jax.lax.scan(
        lambda c, i: (body(c, p, b, i), None), jnp.float32(0.0), jnp.arange(K))[0])
    float(f(params, batch))
    b2 = {k: v + jnp.float32(1e-3) for k, v in batch.items()}
    t0 = time.time(); float(f(params, b2))
    print(f"{name}: {(time.time()-t0)/K*1000:.0f} ms", flush=True)


import os
ONLY = os.environ.get("ONLY", "")


def fwd_body(c, p, b, i):
    out = model.apply(
        p, b["motion"] + c * 1e-6, jnp.zeros((B,), jnp.int32),
        None, b["keyframes"], b["keyframe_valid"],
        audio_features=b["audio_features"],
    )
    return jnp.sum(out[0, 0]).astype(jnp.float32)


if ONLY in ("", "fwd"):
    chain("denoiser fwd (cached features)", fwd_body)


def grad_body(c, p, b, i):
    def loss_fn(pp):
        out = model.apply(
            pp, b["motion"] + c * 1e-6, jnp.zeros((B,), jnp.int32),
            None, b["keyframes"], b["keyframe_valid"],
            audio_features=b["audio_features"],
        )
        return jnp.mean((out - b["motion"]) ** 2).astype(jnp.float32)

    l, g = jax.value_and_grad(loss_fn)(p)
    # consume the grads for real — a *0 lets XLA dead-code the backward
    gsum = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(g))
    return l + gsum * jnp.float32(1e-12)


if ONLY in ("", "grad"):
    chain("fwd+grad (plain mse)", grad_body)

sched = make_schedule("cosine", 1000)
dcfg = DiffusionConfig()
state = create_train_state(params, TrainConfig(lr=1e-4))
step_fn = make_diffusion_train_step(model, sched, dcfg, 0.0)


def f_step(s0, b):
    def body(s_, i):
        s2, m = step_fn(s_, b, jax.random.fold_in(jax.random.PRNGKey(2), i))
        return s2, m["loss"].astype(jnp.float32)

    return jax.lax.scan(body, s0, jnp.arange(K))[1][-1]


if ONLY in ("", "step"):
    f = jax.jit(f_step)
    float(f(state, batch))
    b2 = {k: v + jnp.float32(1e-3) for k, v in batch.items()}
    t0 = time.time(); float(f(state, b2))
    print(f"full train step: {(time.time()-t0)/K*1000:.0f} ms", flush=True)

# --- same full step, rbg PRNG for the dropout/cond_drop draws -------------
key_rbg = jax.random.key(2, impl="rbg")


def f_step_rbg(s0, b):
    def body(s_, i):
        s2, m = step_fn(s_, b, jax.random.fold_in(key_rbg, i))
        return s2, m["loss"].astype(jnp.float32)

    return jax.lax.scan(body, s0, jnp.arange(K))[1][-1]


if ONLY in ("", "rbg"):
    f2 = jax.jit(f_step_rbg)
    float(f2(state, batch))
    b3 = {k: v + jnp.float32(2e-3) for k, v in batch.items()}
    t0 = time.time(); float(f2(state, b3))
    print(f"full train step (rbg rng): {(time.time()-t0)/K*1000:.0f} ms", flush=True)
