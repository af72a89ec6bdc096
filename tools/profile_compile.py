"""Per-op TPU compile/run profiler for the hot pipeline pieces.

Run on the real chip: ``python tools/profile_compile.py``.
Identifies which subgraphs dominate compile time (the practical cost on this
single-host setup) and steady-state run time.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from audio2photoreal_tpu.core.config import GuideConfig
from audio2photoreal_tpu.models.audio_encoder import ConvFeatureExtractor
from audio2photoreal_tpu.models.guide import GuideCond, GuideTransformer, _AudioPreNet, nucleus_sample
from audio2photoreal_tpu.ops.resample import resample
from audio2photoreal_tpu.utils.profiling import aot_compile


def timed_run(name, compiled, *args):
    t0 = time.time()
    out = compiled(*args)
    jax.block_until_ready(out)
    print(f"[run] {name}: {time.time()-t0:.3f}s", flush=True)
    return out


def main():
    B, T = 1, 600
    S = T * 1600
    wav = jax.random.normal(jax.random.PRNGKey(0), (B, S))
    c = aot_compile("resample 960k→320k", lambda w: resample(w, 48000, 16000), wav)
    timed_run("resample", c, wav)

    wav16 = jax.random.normal(jax.random.PRNGKey(1), (B, S // 3))
    fe = ConvFeatureExtractor()
    fp = jax.jit(fe.init)(jax.random.PRNGKey(2), wav16)
    c = aot_compile("wav2vec extractor 320k", lambda w: fe.apply(fp, w), wav16)
    timed_run("wav2vec", c, wav16)

    feats = jax.random.normal(jax.random.PRNGKey(3), (B, 1998, 1024))
    pn = _AudioPreNet(1024)
    pp = jax.jit(pn.init)(jax.random.PRNGKey(4), feats)
    c = aot_compile("guide prenet 1998tok", lambda f: pn.apply(pp, f), feats)
    timed_run("prenet", c, feats)

    gcfg = GuideConfig(tokens=1024, latent_dim=512, ff_size=1024, num_layers=6,
                       num_heads=4, vq_depth=4)
    guide = GuideTransformer(gcfg)
    audio = jax.random.normal(jax.random.PRNGKey(5), (B, S, 2)) * 0.1
    gp = jax.jit(guide.init)({"params": jax.random.PRNGKey(6)}, jnp.zeros((B, 4), jnp.int32), audio)
    ct = jax.random.normal(jax.random.PRNGKey(7), (B, 1950, 512))
    ch = jax.random.normal(jax.random.PRNGKey(8), (B, 512))

    def decode_scan(ct, ch, key):
        cond = GuideCond(ct, ch)
        buf = jnp.full((B, 81), 1024, jnp.int32)

        def body(carry, i):
            buf, k = carry
            k, sub = jax.random.split(k)
            logits = guide.apply(gp, buf, cond, method=GuideTransformer.decode_logits)
            step_logits = jnp.take_along_axis(
                logits, i[None, None, None].repeat(B, 0), axis=1
            )[:, 0]
            tok = nucleus_sample(sub, step_logits, 0.94)
            buf = buf.at[:, i + 1].set(tok)
            return (buf, k), None

        (buf, _), _ = jax.lax.scan(body, (buf, key), jnp.arange(80))
        return buf

    c = aot_compile("guide decode scan (80 steps)", decode_scan, ct, ch, jax.random.PRNGKey(9))
    timed_run("decode scan", c, ct, ch, jax.random.PRNGKey(9))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
