"""Autoregressive guide transformer: audio → residual-VQ pose tokens.

Re-design of the reference GuideTransformer (model/guide.py:26-222):
token embedding (+1 start token), dilated-conv audio pre-net (valid convs,
guide.py:84-116), FiLM decoder stack conditioned on the pooled audio hidden,
causal self-attention, nucleus (top-p) sampling.

TPU-native generation: the reference re-runs the FULL transformer — including
the frozen wav2vec audio encoder — for every generated token with no cache
(guide.py:197-218).  Here conditioning is encoded ONCE and the decode loop is
a single compiled ``lax.scan`` over a fixed-size token buffer with causal
masking (sequences are ≤ ~81 tokens at 1 fps × depth, so the buffer re-forward
is cheap and cache-free; the scan never re-touches audio).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audio2photoreal_tpu.core.config import GuideConfig
from audio2photoreal_tpu.models.audio_encoder import Wav2VecFeatureExtractor
from audio2photoreal_tpu.models.blocks import FiLMDecoderLayer
from audio2photoreal_tpu.ops.attention import causal_bias
from audio2photoreal_tpu.ops.convs import conv1d
from audio2photoreal_tpu.ops.rotary import make_rotary_table


class GuideCond(NamedTuple):
    cond_tokens: jnp.ndarray  # [B, Tc, D] normed audio memory
    cond_hidden: jnp.ndarray  # [B, D] pooled FiLM vector


class _AudioPreNet(nn.Module):
    """Dilated conv stack over audio features, VALID padding — lengths shrink
    by 24 per block like the reference (guide.py:84-116)."""

    channels: int
    num_blocks: int = 2
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c = self.channels
        layer_idx = 0
        for _ in range(self.num_blocks):
            for cin, cout, d in [
                (c, max(256, c), 1),
                (max(256, c), max(256, c), 2),
                (max(128, c), max(128, c), 3),
                (max(128, c), c, 1),
                (c, c, 2),
                (c, c, 3),
            ]:
                kern = self.param(
                    f"conv{layer_idx}_kernel", nn.initializers.lecun_normal(), (3, cin, cout)
                )
                b = self.param(f"conv{layer_idx}_bias", nn.initializers.zeros, (cout,))
                x = conv1d(x, kern, b, dilation=d, padding=(0, 0))
                x = nn.leaky_relu(x, negative_slope=0.2)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
                layer_idx += 1
        kern = self.param("conv_out_kernel", nn.initializers.lecun_normal(), (1, c, c))
        b = self.param("conv_out_bias", nn.initializers.zeros, (c,))
        return conv1d(x, kern, b, padding=(0, 0))


class GuideTransformer(nn.Module):
    cfg: GuideConfig

    @property
    def start_token(self) -> int:
        return self.cfg.tokens  # vocab = tokens + 1, start id = tokens (guide.py:43-45,196)

    def setup(self):
        c = self.cfg
        D = c.latent_dim
        self.token_embedding = nn.Embed(c.tokens + 1, D, name="token_embedding")
        self.audio_frontend = Wav2VecFeatureExtractor(
            compute_dtype=c.frontend_dtype, name="audio_frontend"
        )
        self.pre_audio = _AudioPreNet(c.cond_feature_dim, name="pre_audio")
        self.cond_projection = nn.Dense(D, name="cond_projection")
        self.non_attn_norm = nn.LayerNorm(epsilon=1e-5, name="non_attn_norm")
        self.non_attn_d1 = nn.Dense(D, name="non_attn_d1")
        self.non_attn_d2 = nn.Dense(D, name="non_attn_d2")
        self.norm_cond = nn.LayerNorm(epsilon=1e-5, name="norm_cond")
        # null-cond length: audio tokens shrink by 24 per prenet block
        emb_len = 2048  # static upper bound; sliced to the actual cond length
        self.null_cond_embed = self.param(
            "null_cond_embed", nn.initializers.normal(1.0), (1, emb_len, D)
        )
        self.null_cond_hidden = self.param(
            "null_cond_hidden", nn.initializers.normal(1.0), (1, D)
        )
        self.layers = [
            FiLMDecoderLayer(D, c.num_heads, c.ff_size, c.dropout, name=f"decoder_{i}")
            for i in range(c.num_layers)
        ]
        self.final_layer = nn.Dense(c.tokens, name="final_layer")
        self.rotary = make_rotary_table(D, 4096)

    # -------------------------------------------------------------- #

    def encode_conditioning(
        self,
        audio: Optional[jnp.ndarray],  # [B, S, 2] raw 48 kHz
        keep_mask: Optional[jnp.ndarray] = None,  # [B] bool CFG keep
        deterministic: bool = True,
        audio_features: Optional[jnp.ndarray] = None,  # [B, Ta, 1024] precomputed
    ) -> GuideCond:
        if audio_features is not None:
            feats = jax.lax.stop_gradient(audio_features)
        else:
            feats = jax.lax.stop_gradient(self.audio_frontend(audio))
        cond = self.pre_audio(feats, deterministic=deterministic)
        cond = self.cond_projection(cond)
        if keep_mask is not None:
            cond = jnp.where(
                keep_mask[:, None, None], cond, self.null_cond_embed[:, : cond.shape[1], :]
            )
        pooled = cond.mean(axis=-2)
        hidden = self.non_attn_norm(pooled)
        hidden = self.non_attn_d2(nn.silu(self.non_attn_d1(hidden)))
        if keep_mask is not None:
            hidden = jnp.where(keep_mask[:, None], hidden, self.null_cond_hidden)
        return GuideCond(self.norm_cond(cond), hidden)

    def decode_logits(
        self,
        tokens: jnp.ndarray,  # [B, L] int32
        cond: GuideCond,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = self.token_embedding(tokens)
        L = tokens.shape[1]
        bias = causal_bias(L, L)[None, None]
        for layer in self.layers:
            x = layer(
                x,
                cond.cond_tokens,
                cond.cond_hidden,
                self_bias=bias,
                rotary=self.rotary,
                deterministic=deterministic,
            )
        return self.final_layer(x)

    def __call__(
        self,
        tokens: jnp.ndarray,
        audio: Optional[jnp.ndarray],
        cond_drop_prob: float = 0.0,
        deterministic: bool = True,
        audio_features: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Teacher-forced training forward → [B, L, tokens] logits."""
        B = tokens.shape[0]
        if cond_drop_prob > 0.0:
            keep = ~jax.random.bernoulli(self.make_rng("cond_drop"), cond_drop_prob, (B,))
        else:
            keep = jnp.ones((B,), bool)
        cond = self.encode_conditioning(audio, keep, deterministic, audio_features=audio_features)
        return self.decode_logits(tokens, cond, deterministic)

    # -------------------------------------------------------------- #

    def generate(
        self,
        audio: jnp.ndarray,  # [B, S, 2]
        num_tokens: int,  # keyframes × vq_depth
        key: jax.Array,
        top_p: float = 0.94,
        use_cache: bool = True,
    ) -> jnp.ndarray:
        """Nucleus sampling decode (reference: guide.py:174-222), as one scan.

        With ``use_cache`` each step runs ONE token against cached self-attn
        K/V and precomputed cross-attn K/V (O(L) per step); the cache-free
        path re-forwards the whole buffer (O(L²), still audio-encode-free
        unlike the reference)."""
        B = audio.shape[0]
        cond = self.encode_conditioning(audio, deterministic=True)
        buf = jnp.full((B, num_tokens + 1), self.start_token, dtype=jnp.int32)

        if not use_cache:
            def body(carry, i):
                buf, k = carry
                k, sub = jax.random.split(k)
                logits = self.decode_logits(buf, cond, deterministic=True)
                step_logits = jnp.take_along_axis(
                    logits, i[None, None, None].repeat(B, 0), axis=1
                )[:, 0]  # [B, vocab] — logits at position i predict token i+1
                tok = nucleus_sample(sub, step_logits, top_p)
                buf = buf.at[:, i + 1].set(tok)
                return (buf, k), None

            (buf, _), _ = jax.lax.scan(body, (buf, key), jnp.arange(num_tokens))
            return buf[:, 1:]  # drop start token (guide.py:221)

        D = self.cfg.latent_dim
        n_layers = len(self.layers)
        L = num_tokens + 1
        cross = [
            layer.precompute_cross(cond.cond_tokens, self.rotary) for layer in self.layers
        ]
        ks0 = jnp.zeros((n_layers, B, L, D))
        vs0 = jnp.zeros((n_layers, B, L, D))

        def body(carry, i):
            buf, ks, vs, k = carry
            k, sub = jax.random.split(k)
            tok = jax.lax.dynamic_slice(buf, (0, i), (B, 1))  # [B, 1]
            x = self.token_embedding(tok)  # [B, 1, D]
            for l, layer in enumerate(self.layers):
                x, k_l, v_l = layer.step(
                    x, i, ks[l], vs[l], cross[l][0], cross[l][1],
                    cond.cond_hidden, self.rotary,
                )
                ks = ks.at[l].set(k_l)
                vs = vs.at[l].set(v_l)
            logits = self.final_layer(x[:, 0])
            tok_next = nucleus_sample(sub, logits, top_p)
            buf = buf.at[:, i + 1].set(tok_next)
            return (buf, ks, vs, k), None

        (buf, _, _, _), _ = jax.lax.scan(body, (buf, ks0, vs0, key), jnp.arange(num_tokens))
        return buf[:, 1:]


def nucleus_probs(logits: jnp.ndarray, top_p: float):
    """The reference's shifted-nucleus mask construction (guide.py:203-218):
    sort descending, cumsum, shift-right (so the argmax is ALWAYS kept), zero
    the tail where the cumulative probability of strictly-previous tokens has
    reached top_p, renormalize.

    Returns ``(sorted_idx, keep, kept_renorm)`` in sorted order — exposed
    separately from the sampling draw so the selection LAW is testable on
    fixed logits (tests/test_topp_ancestral_parity.py)."""
    probs = jax.nn.softmax(logits, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]
    sorted_idx = jnp.argsort(probs, axis=-1)[:, ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    shifted = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=-1)
    keep = shifted < top_p
    kept = jnp.where(keep, sorted_probs, 0.0)
    kept = kept / kept.sum(axis=-1, keepdims=True)
    return sorted_idx, keep, kept


def nucleus_sample(key: jax.Array, logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Top-p sampling matching the reference's shifted-nucleus construction
    (guide.py:203-218): always keep the argmax, cut where the cumulative
    probability of STRICTLY-PREVIOUS tokens reaches top_p."""
    sorted_idx, _, kept = nucleus_probs(logits, top_p)
    choice = jax.random.categorical(key, jnp.log(kept + 1e-12), axis=-1)
    return jnp.take_along_axis(sorted_idx, choice[:, None], axis=-1)[:, 0]
