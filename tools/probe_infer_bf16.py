"""bf16 vs f32 inference for the two motion branches at the bench operating
point (B=1, T=600, DDIM-500 CFG).  bf16 is the TPU deployment dtype — the
training path already runs it; this measures what the product gains if the
samplers run the model forward in bf16 (sampler state/schedule math stays
f32 inside ddim_sample_loop either way).

Usage: python tools/probe_infer_bf16.py [pose|face] [float32|bfloat16] [flash01]
Prints one line: wall seconds per 20 s clip + x_realtime.
"""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import DenoiserConfig, DiffusionConfig
from audio2photoreal_tpu.diffusion import sampling
from audio2photoreal_tpu.diffusion.respace import maybe_respaced
from audio2photoreal_tpu.models.cfg import cfg_model_fn
from audio2photoreal_tpu.models.film_transformer import CondTokens, FiLMDenoiser

fam = sys.argv[1] if len(sys.argv) > 1 else "pose"
dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
flash = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
pose = fam == "pose"

B, T = 1, 600
AUDIO_SECS = T / 30.0
cfg = DenoiserConfig(
    data_format=fam, nfeats=104 if pose else 256,
    latent_dim=256 if pose else 512, ff_size=1024, num_layers=8,
    num_heads=4, max_seq_length=T, dtype=dtype, flash_attention=flash,
)
dcfg = DiffusionConfig(timestep_respacing="ddim500")
model = FiLMDenoiser(cfg)
rng = np.random.RandomState(0)
audio = jnp.asarray(rng.randn(B, T * 1600, 2).astype(np.float32) * 0.1)
x = jnp.asarray(rng.randn(B, T, cfg.nfeats).astype(np.float32))
t0v = jnp.zeros((B,), jnp.int32)
K = T // 30
kf = jnp.asarray(rng.randn(B, K, 104).astype(np.float32))
kv = jnp.ones((B, K))
init_args = (x, t0v, audio) + ((kf, kv) if pose else ())
params = jax.jit(model.init)({"params": jax.random.PRNGKey(3)}, *init_args)
jax.block_until_ready(params)

enc = jax.jit(
    lambda p, a: model.apply(
        p, a, kf if pose else None, kv if pose else None,
        method=FiLMDenoiser.encode_conditioning,
    )
)
cond = enc(params, audio)
jax.block_until_ready(cond.cond_tokens)

sched = maybe_respaced(dcfg.schedule, dcfg.steps, dcfg.timestep_respacing)
scale = 2.0 if pose else 10.0


def apply_fn(p, xx, tt, cc, keep):
    return model.apply(p, xx, tt, cc, keep, method=FiLMDenoiser.denoise)


def ddim(p, cond_tokens, pose_tokens, xT, key):
    mf = cfg_model_fn(apply_fn, p, CondTokens(cond_tokens, pose_tokens), scale)
    return sampling.ddim_sample_loop(sched, dcfg.predict, mf, xT, key).pred_xstart


ddim_c = jax.jit(ddim)
xT = jnp.asarray(rng.randn(B, T, cfg.nfeats).astype(np.float32))
out0 = ddim_c(params, cond.cond_tokens, cond.pose_tokens, xT, jax.random.PRNGKey(7))
jax.block_until_ready(out0)

n = 3
t0 = time.perf_counter()
for i in range(n):
    cond = enc(params, audio + jnp.float32(1e-5 * (i + 1)))
    out = ddim_c(params, cond.cond_tokens, cond.pose_tokens, xT, jax.random.PRNGKey(20 + i))
jax.block_until_ready(out)
wall = (time.perf_counter() - t0) / n
# deviation of the bf16 forward vs whatever f32 run preceded isn't computed
# here — compare across invocations
print(
    f"{fam} {dtype} flash={int(flash)}: {wall:.3f} s/clip, "
    f"{AUDIO_SECS/wall:.2f}x realtime, |out|max={float(jnp.abs(out).max()):.4f} "
    f"mean={float(jnp.mean(out)):.6f}",
    flush=True,
)
