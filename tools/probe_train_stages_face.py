"""Face-denoiser train-step stage timings (VERDICT r2 weak #5: where do the
~290 ms/step beyond the pose model go?).

Operating point: bs 64, T=600, cached features (audio_features + lip_verts
precomputed), no-remat, flash attention — same as bench_train_face.
Scan-chains K iterations with perturbed inputs inside ONE jit and fetches a
scalar (probe hygiene, NOTES_ROUND3)."""
import sys, time

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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
T, K = 600, 4
cfg = DenoiserConfig(
    data_format="face", nfeats=256, latent_dim=512, ff_size=1024,
    num_layers=8, num_heads=4, max_seq_length=T, dtype="bfloat16",
    remat=False, flash_attention=True, frontend_dtype="bfloat16",
)
rng = np.random.RandomState(0)
Ta = feature_frames(T * 1600 // 3)
batch = {
    "motion": jnp.asarray(rng.randn(B, T, 256).astype(np.float32) * 0.1),
    "mask": jnp.ones((B, T), jnp.float32),
    "audio_features": jnp.asarray(rng.randn(B, Ta, 1024).astype(np.float32) * 0.5),
    "lip_verts": jnp.asarray(rng.randn(B, T, 1014).astype(np.float32) * 0.1),
}
model = FiLMDenoiser(cfg)
params = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
    batch["motion"], jnp.zeros((B,), jnp.int32),
    jnp.zeros((B, T * 1600, 2), jnp.float32),
)


def chain(name, body):
    try:
        f = jax.jit(lambda p, b: jax.lax.scan(
            lambda c, _: (body(c, p, b), None), jnp.float32(0.0), None, length=K)[0])
        float(f(params, batch))
        b2 = {k: v + jnp.float32(1e-3) for k, v in batch.items()}
        t0 = time.time(); float(f(params, b2))
        print(f"{name}: {(time.time()-t0)/K*1000:.0f} ms", flush=True)
        del b2
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}", flush=True)


def cond_fwd(c, p, b):
    cond = model.apply(
        p, None, audio_features=b["audio_features"] + c * 1e-6,
        lip_verts=b["lip_verts"],
        method=FiLMDenoiser.encode_conditioning,
    )
    return jnp.sum(cond.cond_tokens[:, 0, 0]).astype(jnp.float32)


def full_fwd(c, p, b):
    out = model.apply(
        p, b["motion"] + c * 1e-6, jnp.zeros((B,), jnp.int32), None,
        audio_features=b["audio_features"], lip_verts=b["lip_verts"],
    )
    return jnp.sum(out[:, 0, 0]).astype(jnp.float32)


def denoise_fwd(c, p, b):
    # conditioning PRE-computed outside the timed body: the decoder stack alone
    cond = model.apply(
        p, None, audio_features=b["audio_features"], lip_verts=b["lip_verts"],
        method=FiLMDenoiser.encode_conditioning,
    )
    cond = jax.tree_util.tree_map(
        lambda x: jax.lax.stop_gradient(x) if x is not None else x, cond,
        is_leaf=lambda x: x is None,
    )
    out = model.apply(
        p, b["motion"] + c * 1e-6, jnp.zeros((B,), jnp.int32), cond,
        jnp.ones((B,), bool), method=FiLMDenoiser.denoise,
    )
    return jnp.sum(out[:, 0, 0]).astype(jnp.float32)


def cond_fwd_bwd(c, p, b):
    def loss(pp):
        cond = model.apply(
            pp, None, audio_features=b["audio_features"] + c * 1e-6,
            lip_verts=b["lip_verts"], method=FiLMDenoiser.encode_conditioning,
        )
        return jnp.sum(cond.cond_tokens.astype(jnp.float32) ** 2) * 1e-6

    g = jax.grad(loss)(p)
    return sum(
        jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree_util.tree_leaves(g)
    ) * 1e-9


def proj_only(c, p, b):
    # cond_projection alone: concat(feats, lip) [B,Ta,2038] -> D matmul
    feats = b["audio_features"] + c * 1e-6
    v = b["lip_verts"]
    Ta_ = feats.shape[1]
    idx = jnp.clip(((jnp.arange(Ta_) + 0.5) * T / Ta_).astype(jnp.int32), 0, T - 1)
    lip = v[:, idx, :]
    x = jnp.concatenate([feats, lip], axis=-1)
    w = p["params"]["cond_projection"]["kernel"]
    bb = p["params"]["cond_projection"]["bias"]
    return jnp.sum((x @ w + bb)[:, 0, 0]).astype(jnp.float32)


def enc_layers_only(c, p, b):
    # the 2 rotary encoder layers alone on a fixed [B,Ta,D] input
    from audio2photoreal_tpu.models.blocks import RotaryEncoderLayer
    from audio2photoreal_tpu.ops.rotary import make_rotary_table

    Ta_ = b["audio_features"].shape[1]
    x = (b["audio_features"][..., : cfg.latent_dim] + c * 1e-6).astype(
        jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    )
    rot = make_rotary_table(cfg.latent_dim, Ta_ + 8)
    for i in range(cfg.cond_encoder_layers):
        layer = RotaryEncoderLayer(
            cfg.latent_dim, cfg.num_heads, cfg.ff_size,
            dtype=jnp.bfloat16, flash=cfg.flash_attention,
        )
        x = layer.apply(
            {"params": p["params"][f"cond_encoder_{i}"]}, x, rotary=rot
        )
    return jnp.sum(x[:, 0, 0]).astype(jnp.float32)


chain("cond_encode fwd (cached feats)", cond_fwd)
chain("  cond_projection matmul only", proj_only)
chain("  cond_encoder 2 layers only", enc_layers_only)
chain("cond_encode fwd+bwd", cond_fwd_bwd)
chain("denoise-only fwd", denoise_fwd)
chain("full fwd", full_fwd)

sched = make_schedule("cosine", 1000)
state = create_train_state(params, TrainConfig(lr=1e-4))
step_fn = make_diffusion_train_step(model, sched, DiffusionConfig())


def chain_step():
    def f_(s, b):
        def body(s_, i):
            s2, m = step_fn(s_, b, jax.random.fold_in(rng_util.key(2, "rbg"), i))
            return s2, m["loss"].astype(jnp.float32)

        return jax.lax.scan(body, s, jnp.arange(K))[0]

    try:
        f = jax.jit(f_, donate_argnums=(0,))
        state1 = f(state, batch)  # returns final state; fresh weights each call
        jax.block_until_ready(state1.params)
        t0 = time.time()
        state2 = f(state1, batch)
        float(state2.step)  # scalar fetch; state changed → no dispatch coalescing
        print(f"train step (state threaded): {(time.time()-t0)/K*1000:.0f} ms", flush=True)
    except Exception as e:
        print(f"train step: FAILED {type(e).__name__}: {e}", flush=True)


chain_step()
