"""Wav2VecFeatureExtractor batch_chunk sweep at the bs-64 training point.

The extractor streams batch 64 through ``lax.map`` chunks (memory bound);
bigger chunks = fewer, larger matmuls.  bf16 frontend, B=64, 20 s audio.
"""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.models.audio_encoder import Wav2VecFeatureExtractor

B, S = 64, 600 * 1600
rng = np.random.RandomState(0)
audio = jnp.asarray(rng.randn(B, S, 2).astype(np.float32) * 0.1)

for chunk in (8, 16, 32, 64):
    fe = Wav2VecFeatureExtractor(compute_dtype="bfloat16", batch_chunk=chunk)
    params = jax.jit(fe.init)(jax.random.PRNGKey(0), audio[:2])
    f = jax.jit(lambda p, a: jnp.sum(fe.apply(p, a)).astype(jnp.float32))
    try:
        float(f(params, audio))
        t0 = time.time(); float(f(params, audio + jnp.float32(0.25)))
        print(f"chunk={chunk}: {(time.time()-t0)*1000:.0f} ms", flush=True)
    except Exception as e:
        print(f"chunk={chunk}: {type(e).__name__}", flush=True)
