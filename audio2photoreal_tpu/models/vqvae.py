"""Residual VQ-VAE over 1 fps pose keyframes, with functional EMA codebooks.

Re-design of the reference TemporalVertexCodec stack (model/vqvae.py:41-550):
- causal dilated conv encoder/decoder (receptive field 8, single left-pad of 7
  at the input, vqvae.py:403-414,432-464),
- ResidualVectorQuantization: depth-N stack of EMA EuclideanCodebooks with
  k-means init on the first batch, dead-code expiry, straight-through
  estimator and commitment loss (vqvae.py:96-392).

TPU-native state handling: torch keeps codebooks as mutated buffers and
broadcasts them across workers (vqvae.py:148-149,167).  Here the codebooks are
an explicit ``VQState`` pytree threaded through the jitted train step; batch
statistics are ``psum``-reduced over the data axis BEFORE the EMA update, so
every replica applies the identical update (strictly stronger determinism
than the reference's broadcast-from-init approach).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audio2photoreal_tpu.core.config import VQConfig
from audio2photoreal_tpu.parallel.collectives import psum
from audio2photoreal_tpu.ops.convs import conv1d


class VQState(NamedTuple):
    """EMA codebook state for all residual layers, leading axis = depth."""

    embed: jnp.ndarray  # [depth, codes, dim]
    embed_avg: jnp.ndarray  # [depth, codes, dim]
    cluster_size: jnp.ndarray  # [depth, codes]
    inited: jnp.ndarray  # [] bool

    @classmethod
    def create(cls, key: jax.Array, cfg: VQConfig) -> "VQState":
        if cfg.kmeans_init:
            embed = jnp.zeros((cfg.depth, cfg.code_dim, cfg.emb_width))
        else:
            embed = jax.nn.initializers.he_uniform()(
                key, (cfg.depth, cfg.code_dim, cfg.emb_width)
            )
        return cls(
            embed=embed,
            embed_avg=embed,
            cluster_size=jnp.zeros((cfg.depth, cfg.code_dim)),
            inited=jnp.asarray(not cfg.kmeans_init),
        )


def _sample_vectors(key: jax.Array, samples: jnp.ndarray, num: int) -> jnp.ndarray:
    """num rows from samples, with replacement if too few (vqvae.py:62-70)."""
    idx = jax.random.randint(key, (num,), 0, samples.shape[0])
    return samples[idx]


def kmeans(
    key: jax.Array, samples: jnp.ndarray, num_clusters: int, num_iters: int = 10
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration k-means (vqvae.py:73-94), scan-compiled."""
    means0 = _sample_vectors(key, samples, num_clusters)

    def step(means, _):
        d2 = (
            (samples**2).sum(-1, keepdims=True)
            - 2 * samples @ means.T
            + (means**2).sum(-1)[None]
        )
        buckets = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = onehot.sum(0)
        sums = onehot.T @ samples
        new_means = sums / jnp.maximum(bins, 1.0)[:, None]
        means = jnp.where((bins == 0)[:, None], means, new_means)
        return means, bins

    means, bins_hist = jax.lax.scan(step, means0, None, length=num_iters)
    return means, bins_hist[-1]


def _quantize_one(embed: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-code indices. x [N, dim], embed [codes, dim] → [N]."""
    d2 = (
        (x**2).sum(-1, keepdims=True)
        - 2 * jnp.dot(x, embed.T, preferred_element_type=jnp.float32)
        + (embed**2).sum(-1)[None]
    )
    return jnp.argmin(d2, axis=-1)


def _ema_layer_update(
    key: jax.Array,
    embed: jnp.ndarray,
    embed_avg: jnp.ndarray,
    cluster_size: jnp.ndarray,
    x: jnp.ndarray,  # [N, dim]
    onehot: jnp.ndarray,  # [N, codes]
    cfg: VQConfig,
    axis: str,
):
    """One codebook's EMA + dead-code expiry (vqvae.py:157-224)."""
    counts = psum(onehot.sum(0), axis)
    sums = psum(onehot.T @ x, axis)

    # dead-code expiry BEFORE the EMA update, like the reference (:212-215)
    expired = cluster_size < cfg.threshold_ema_dead_code
    replacement = _sample_vectors(key, x, embed.shape[0])
    embed = jnp.where(expired[:, None], replacement, embed)

    cluster_size = cluster_size * cfg.decay + counts * (1 - cfg.decay)
    embed_avg = embed_avg * cfg.decay + sums * (1 - cfg.decay)
    n = cluster_size.sum()
    smoothed = (cluster_size + 1e-5) / (n + cluster_size.shape[0] * 1e-5) * n
    embed = jnp.where(expired[:, None], embed, embed_avg / smoothed[:, None])
    return embed, embed_avg, cluster_size


def residual_quantize(
    x: jnp.ndarray,  # [N, dim]
    state: VQState,
    cfg: VQConfig,
    *,
    train: bool = False,
    key: Optional[jax.Array] = None,
    axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, VQState]:
    """→ (quantized [N, dim], codes [N, depth], commit_loss [], new_state)."""
    if train:
        assert key is not None
        init_key, *layer_keys = jax.random.split(key, cfg.depth + 1)

        def do_kmeans(st: VQState) -> VQState:
            # initialize each residual layer on the true residual stream
            embeds, sizes, residual = [], [], x
            for d in range(cfg.depth):
                kd = jax.random.fold_in(init_key, d)
                means, bins = kmeans(kd, residual, cfg.code_dim, cfg.kmeans_iters)
                embeds.append(means)
                sizes.append(bins)
                codes = _quantize_one(means, residual)
                residual = residual - means[codes]
            embed = jnp.stack(embeds)
            return VQState(
                embed=pmean_state(embed, axis),
                embed_avg=pmean_state(embed, axis),
                cluster_size=pmean_state(jnp.stack(sizes), axis),
                inited=jnp.asarray(True),
            )

        state = jax.lax.cond(state.inited, lambda s: s, do_kmeans, state)

    residual = x
    quantized_out = jnp.zeros_like(x)
    codes_list = []
    commit = 0.0
    new_embed, new_avg, new_size = [], [], []
    for d in range(cfg.depth):
        codes = _quantize_one(state.embed[d], residual)
        q = state.embed[d][codes]
        if train:
            onehot = jax.nn.one_hot(codes, cfg.code_dim, dtype=x.dtype)
            e, a, s = _ema_layer_update(
                layer_keys[d],
                state.embed[d],
                state.embed_avg[d],
                state.cluster_size[d],
                residual,
                onehot,
                cfg,
                axis,
            )
            new_embed.append(e)
            new_avg.append(a)
            new_size.append(s)
            commit = commit + ((jax.lax.stop_gradient(q) - residual) ** 2).mean()
            # straight-through on each layer's contribution (vqvae.py:311)
            q = residual + jax.lax.stop_gradient(q - residual)
        codes_list.append(codes)
        quantized_out = quantized_out + q
        residual = residual - jax.lax.stop_gradient(q) if not train else residual - q
    codes_arr = jnp.stack(codes_list, axis=-1)
    if train:
        state = VQState(
            embed=jnp.stack(new_embed),
            embed_avg=jnp.stack(new_avg),
            cluster_size=jnp.stack(new_size),
            inited=state.inited,
        )
        commit = commit / cfg.depth
    return quantized_out, codes_arr, jnp.asarray(commit, x.dtype), state


def pmean_state(x, axis: str):
    from audio2photoreal_tpu.parallel.collectives import pmean

    return pmean(x, axis)


def rvq_encode(x: jnp.ndarray, state: VQState, cfg: VQConfig) -> jnp.ndarray:
    """[N, dim] → codes [N, depth] (vqvae.py:365-380)."""
    residual, codes_list = x, []
    for d in range(cfg.depth):
        codes = _quantize_one(state.embed[d], residual)
        residual = residual - state.embed[d][codes]
        codes_list.append(codes)
    return jnp.stack(codes_list, axis=-1)


def rvq_decode(codes: jnp.ndarray, state: VQState, cfg: VQConfig) -> jnp.ndarray:
    """codes [N, depth] → [N, dim] (vqvae.py:382-392)."""
    out = 0.0
    for d in range(cfg.depth):
        out = out + state.embed[d][codes[..., d]]
    return out


def perplexity(codes: jnp.ndarray, num_codes: int) -> jnp.ndarray:
    """Codebook usage perplexity (vqvae.py:523-534)."""
    onehot = jax.nn.one_hot(codes.reshape(-1), num_codes)
    prob = onehot.mean(axis=0)
    return jnp.exp(-jnp.sum(prob * jnp.log(prob + 1e-7)))


class _CausalConvStack(nn.Module):
    """k=2 dilated conv stack with ONE left-pad of (receptive_field−1) at the
    input, valid convs after — output length == input length
    (vqvae.py:403-414)."""

    specs: Tuple[Tuple[int, int, int, int], ...]  # (cin, cout, kernel, dilation)
    receptive_field: int
    final_activation: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (self.receptive_field - 1, 0), (0, 0)))
        n = len(self.specs)
        for i, (cin, cout, k, d) in enumerate(self.specs):
            kern = self.param(
                f"conv{i}_kernel", nn.initializers.lecun_normal(), (k, cin, cout)
            )
            b = self.param(f"conv{i}_bias", nn.initializers.zeros, (cout,))
            x = conv1d(x, kern, b, dilation=d, padding=(0, 0))
            if i < n - 1 or self.final_activation:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return x


class TemporalVertexCodec(nn.Module):
    """Encoder/decoder around the residual quantizer (vqvae.py:466-550)."""

    cfg: VQConfig

    def setup(self):
        c = self.cfg
        L = c.emb_width
        self.encoder = _CausalConvStack(
            specs=(
                (c.nfeats, L, 1, 1),
                (L, L, 2, 1),
                (L, L, 2, 2),
                (L, L, 2, 3),
                (L, L, 2, 1),
            ),
            receptive_field=8,
            name="encoder",
        )
        self.decoder = _CausalConvStack(
            specs=(
                (L, L, 2, 1),
                (L, L, 2, 2),
                (L, L, 2, 3),
                (L, L, 2, 1),
                (L, c.nfeats, 1, 1),
            ),
            receptive_field=8,
            name="decoder",
        )

    def encode(self, motion: jnp.ndarray, vq: VQState) -> jnp.ndarray:
        """[B, T, nfeats] → codes [B, T, depth]."""
        B, T, _ = motion.shape
        z = self.encoder(motion)
        return rvq_encode(z.reshape(B * T, -1), vq, self.cfg).reshape(B, T, -1)

    def decode(self, codes: jnp.ndarray, vq: VQState) -> jnp.ndarray:
        """codes [B, T, depth] → [B, T, nfeats]."""
        B, T, _ = codes.shape
        z = rvq_decode(codes.reshape(B * T, -1), vq, self.cfg).reshape(B, T, -1)
        return self.decoder(z)

    def __call__(
        self,
        motion: jnp.ndarray,
        vq: VQState,
        *,
        train: bool = False,
        key: Optional[jax.Array] = None,
        axis: str = "data",
    ):
        """→ (recon [B,T,nfeats], commit_loss, perplexity, codes, new_state)."""
        B, T, _ = motion.shape
        z = self.encoder(motion).reshape(B * T, -1)
        q, codes, commit, vq_new = residual_quantize(
            z, vq, self.cfg, train=train, key=key, axis=axis
        )
        recon = self.decoder(q.reshape(B, T, -1))
        ppl = perplexity(codes[:, -1], self.cfg.code_dim)
        return recon, commit, ppl, codes.reshape(B, T, -1), vq_new
