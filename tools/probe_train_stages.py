"""Train-step stage timings.  Scan-chains K iterations with
perturbed inputs inside ONE jit and fetches a scalar — per-call timing with
repeated args lies through the device tunnel (dispatch coalescing)."""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import DenoiserConfig, DiffusionConfig, TrainConfig
from audio2photoreal_tpu.diffusion.schedules import make_schedule
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.train.loops import make_diffusion_train_step
from audio2photoreal_tpu.train.state import create_train_state

B, T, K = 64, 600, 4
import os

cfg = DenoiserConfig(
    data_format="pose", nfeats=104, latent_dim=256, ff_size=1024,
    num_layers=8, num_heads=4, max_seq_length=T, dtype="bfloat16", remat=True,
    frontend_dtype=os.environ.get("FRONTEND_DTYPE", "bfloat16"),
)
rng = np.random.RandomState(0)
batch = {
    "motion": jnp.asarray(rng.randn(B, T, 104).astype(np.float32) * 0.1),
    "mask": jnp.ones((B, T), jnp.float32),
    "audio": jnp.asarray(rng.randn(B, T * 1600, 2).astype(np.float32) * 0.1),
    "keyframes": jnp.asarray(rng.randn(B, 20, 104).astype(np.float32) * 0.1),
    "keyframe_valid": jnp.ones((B, 20), jnp.float32),
}
model = FiLMDenoiser(cfg)
params = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0)},
    batch["motion"], jnp.zeros((B,), jnp.int32), batch["audio"],
    batch["keyframes"], batch["keyframe_valid"],
)


def chain(name, body):
    """body(carry, params, batch) -> scalar; params/batch ride as jit ARGS —
    closing over them bakes ~500MB of constants into the HLO (HTTP 413).
    The scalar must be FETCHED with fresh args (tunnel result cache)."""
    f = jax.jit(lambda p, b: jax.lax.scan(
        lambda c, _: (body(c, p, b), None), jnp.float32(0.0), None, length=K)[0])
    float(f(params, batch))
    b2 = {k: v + jnp.float32(1e-3) for k, v in batch.items()}
    t0 = time.time(); float(f(params, b2))
    print(f"{name}: {(time.time()-t0)/K*1000:.0f} ms", flush=True)


chain("cond_encode fwd", lambda c, p, b: jnp.sum(
    model.apply(p, b["audio"] + c * 1e-6, None,
                method=FiLMDenoiser.encode_conditioning).cond_tokens[0, 0]
).astype(jnp.float32))

from audio2photoreal_tpu.ops.resample import resample  # noqa: E402

# full-sum tap (a strided tap would let XLA narrow the conv to tapped samples)
chain("  resample 48k->16k x2ch", lambda c, p, b: sum(
    jnp.sum(resample(b["audio"][..., ch] + c * 1e-6, 48_000, 16_000))
    for ch in (0, 1)
).astype(jnp.float32))

chain("full fwd", lambda c, p, b: jnp.sum(
    model.apply(p, b["motion"] + c * 1e-6, jnp.zeros((B,), jnp.int32),
                b["audio"], b["keyframes"], b["keyframe_valid"])[0, 0]
).astype(jnp.float32))

sched = make_schedule("cosine", 1000)
dcfg = DiffusionConfig()
state = create_train_state(params, TrainConfig(lr=1e-4))
step_fn = make_diffusion_train_step(model, sched, dcfg, 0.0)


def chain_step():
    # thread STATE through the carry — an un-threaded state lets XLA
    # dead-code the whole backward+optimizer (reads ~3x faster than truth)
    def f_(s, b):
        def body(s_, i):
            s2, m = step_fn(s_, b, jax.random.fold_in(jax.random.PRNGKey(2), i))
            return s2, m["loss"].astype(jnp.float32)

        return jax.lax.scan(body, s, jnp.arange(K))[1][-1]

    f = jax.jit(f_)
    float(f(state, batch))
    b2 = {k: v + jnp.float32(1e-3) for k, v in batch.items()}
    t0 = time.time(); float(f(state, b2))
    print(f"train step (state threaded): {(time.time()-t0)/K*1000:.0f} ms", flush=True)


chain_step()
