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


def test_cached_generate_matches_uncached_across_settings():
    """Cache correctness is invariant to batch size, decode length, and
    top_p — including the top_p=1.0 (no truncation) edge."""
    cfg = GuideConfig(tokens=16, latent_dim=16, ff_size=32, num_layers=2, num_heads=2, vq_depth=2)
    model = GuideTransformer(cfg)
    for B, n, top_p, seed in ((1, 4, 1.0, 5), (3, 8, 0.5, 7)):
        audio = jax.random.normal(jax.random.PRNGKey(seed), (B, 30 * 1600, 2)) * 0.1
        params = model.init(
            {"params": jax.random.PRNGKey(seed + 1), "cond_drop": jax.random.PRNGKey(2)},
            jnp.zeros((B, 4), jnp.int32), audio,
        )
        kw = dict(method=GuideTransformer.generate, top_p=top_p)
        g_cached = model.apply(params, audio, n, jax.random.PRNGKey(9), use_cache=True, **kw)
        g_plain = model.apply(params, audio, n, jax.random.PRNGKey(9), use_cache=False, **kw)
        assert g_cached.shape == (B, n)
        np.testing.assert_array_equal(np.asarray(g_cached), np.asarray(g_plain))
