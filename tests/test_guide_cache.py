"""KV-cached guide decode == cache-free decode (same RNG stream)."""

import jax
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import GuideConfig
from audio2photoreal_tpu.models.guide import GuideTransformer


def test_cached_generate_matches_uncached():
    cfg = GuideConfig(tokens=16, latent_dim=16, ff_size=32, num_layers=2, num_heads=2, vq_depth=2)
    model = GuideTransformer(cfg)
    B, S = 2, 30 * 1600
    audio = jax.random.normal(jax.random.PRNGKey(0), (B, S, 2)) * 0.1
    params = model.init(
        {"params": jax.random.PRNGKey(1), "cond_drop": jax.random.PRNGKey(2)},
        jnp.zeros((B, 4), jnp.int32), audio,
    )
    g_cached = model.apply(
        params, audio, 6, jax.random.PRNGKey(3), method=GuideTransformer.generate,
        use_cache=True,
    )
    g_plain = model.apply(
        params, audio, 6, jax.random.PRNGKey(3), method=GuideTransformer.generate,
        use_cache=False,
    )
    # same logits → same nucleus draws with the same key stream
    np.testing.assert_array_equal(np.asarray(g_cached), np.asarray(g_plain))
