"""Transformer building blocks shared by the denoiser and the guide LM.

Re-designs of model/modules/transformer_modules.py (reference):
- ``FiLMDecoderLayer`` ← FiLMTransformerDecoderLayer (:127-268): pre-norm,
  each sublayer output gated by FiLM(t) before the residual add.
- ``RotaryEncoderLayer`` ← TransformerEncoderLayerRotary (:36-103).
- FiLM generator ← DenseFiLM/featurewise_affine (:105-125).

Rotary compatibility note: the reference rotates Q=K on the FULL d_model
BEFORE the q/k projections (transformer_modules.py:88,238,252-253) — not
per-head after the split.  That choice is load-bearing for torch-checkpoint
parity, so it is reproduced here.

KV-cache decoding: ``FiLMDecoderLayer.step`` processes ONE new token against
cached self-attention K/V and precomputed cross-attention K/V — the
reference's generate loop re-runs the full transformer per token
(model/guide.py:197-218); here a cached step is O(L) instead of O(L²).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audio2photoreal_tpu.ops.attention import NEG_INF, dot_product_attention
from audio2photoreal_tpu.ops.rotary import RotaryTable, apply_rotary


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """x · tanh(softplus(x)) — torch.nn.Mish equivalent."""
    return x * jnp.tanh(jax.nn.softplus(x))


def exact_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based GELU — matches torch.nn.functional.gelu's default (the
    reference's activation, model/diffusion.py:93)."""
    return nn.gelu(x, approximate=False)


def _key_to_seed(key: jnp.ndarray) -> jnp.ndarray:
    """Fold an (already path-folded) PRNG key to ONE uint32 seed without
    invoking the bit generator."""
    data = key
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    data = data.astype(jnp.uint32).reshape(-1)
    seed = data[0]
    for i in range(1, data.shape[0]):
        seed = jnp.bitwise_xor(seed * jnp.uint32(2654435761), data[i])
    return seed


def hash_drop_mult(key: jnp.ndarray, shape, rate: float, dtype) -> jnp.ndarray:
    """Bernoulli(1−rate) dropout multiplier from an integer POSITION hash —
    no RNG-bit tensor is ever materialized.

    XLA cannot fuse ``rng_bit_generator`` output into its consumers, so every
    ``nn.Dropout`` mask costs a full write+read of random bits: the bs-64
    denoiser step draws ~30 masks and pays 21 ms (pose) / 50 ms (face) for
    them (tools/probe_step_split.py, round 4).  This mask is pure fused ALU
    on an iota — same mixer as the flash kernel's in-kernel dropout
    (ops/pallas/flash.py:hash_mask_mult), deterministic in (key, position),
    unbiased, and identical on every replica slice of a sharded tensor."""
    seed = _key_to_seed(key)
    n = 1
    for s in shape:
        n *= s
    idx = jax.lax.iota(jnp.uint32, n).reshape(shape)
    h = seed * jnp.uint32(2654435761) + idx * jnp.uint32(3266489917)
    h = jnp.bitwise_xor(h, jnp.right_shift(h, jnp.uint32(13))) * jnp.uint32(2654435761)
    h = jnp.bitwise_xor(h, jnp.right_shift(h, jnp.uint32(17))) * jnp.uint32(668265263)
    bits = jnp.bitwise_xor(h, jnp.right_shift(h, jnp.uint32(16)))
    threshold = jnp.uint32(int(rate * 2**32))
    keep = (bits >= threshold).astype(dtype)
    return keep / jnp.asarray(1.0 - rate, dtype)


class HashDropout(nn.Module):
    """Drop-in ``nn.Dropout`` replacement backed by ``hash_drop_mult``.
    Uses the same ``"dropout"`` RNG collection — each call site's
    path-folded key seeds a distinct mask stream."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        return x * hash_drop_mult(key, x.shape, self.rate, x.dtype)


def make_dropout(rate: float, hash_dropout: bool):
    return HashDropout(rate) if hash_dropout else nn.Dropout(rate)


class DenseFiLM(nn.Module):
    """t-vector [B, D] → (scale, shift) each [B, 1, D]."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray):
        h = nn.Dense(self.dim * 2, dtype=self.dtype, name="proj")(mish(t))
        scale, shift = jnp.split(h[:, None, :], 2, axis=-1)
        return scale, shift


def featurewise_affine(x: jnp.ndarray, scale_shift) -> jnp.ndarray:
    scale, shift = scale_shift
    return (scale + 1.0) * x + shift


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible attention (separate q/kv inputs,
    packed-head projections convertible from in_proj_weight).

    Extra cached-decode surface: ``project_kv`` produces projected K/V for
    caching; ``attend`` runs attention given already-projected K/V.

    ``flash=True`` routes un-biased attention through the Pallas
    memory-efficient kernel (ops/pallas/flash.py) — probs (and their dropout
    masks) never hit HBM in either pass.  Engages only when bias is None and
    both sequence axes reach ``_FLASH_MIN_LEN`` (below that the einsum path
    is at least as fast); numerics match to bf16 rounding."""

    dim: int
    heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    flash: bool = False

    _FLASH_MIN_LEN = 128

    def setup(self):
        self.q_proj = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")
        self.k_proj = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")
        self.v_proj = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")
        self.out_proj = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")

    def _split(self, x):
        B = x.shape[0]
        return x.reshape(B, -1, self.heads, self.dim // self.heads).transpose(0, 2, 1, 3)

    def project_kv(self, k_in: jnp.ndarray, v_in: jnp.ndarray):
        return self.k_proj(k_in), self.v_proj(v_in)

    def attend(
        self,
        q_in: jnp.ndarray,  # [B, Tq, D] (pre-projection)
        k: jnp.ndarray,  # [B, Tk, D] (already projected)
        v: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        return self._attend_projected(self.q_proj(q_in), k, v, bias, deterministic)

    def _attend_projected(
        self,
        q: jnp.ndarray,  # [B, Tq, D] (already projected)
        k: jnp.ndarray,
        v: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, Tq, _ = q.shape
        rng = self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        use_flash = (
            self.flash
            and bias is None
            and Tq >= self._FLASH_MIN_LEN
            and k.shape[1] >= self._FLASH_MIN_LEN
        )
        if use_flash:
            from audio2photoreal_tpu.ops.pallas.flash import flash_attention

            rate, seed = 0.0, None
            if rng is not None:
                rate = self.dropout
                seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max)
            out = flash_attention(
                self._split(q), self._split(k), self._split(v),
                dropout_seed=seed, dropout_rate=rate,
            )
        else:
            out = dot_product_attention(
                self._split(q), self._split(k), self._split(v), bias,
                dropout_rate=self.dropout, dropout_rng=rng, deterministic=deterministic,
            )
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.dim)
        return self.out_proj(out)

    def __call__(
        self,
        q_in: jnp.ndarray,
        k_in: jnp.ndarray,
        v_in: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if q_in is k_in and not self.is_initializing():
            # SELF-attention fast path: q and k project the SAME tensor (the
            # pre-projection rotary design rotates q==k together) — run both
            # as ONE [D, 2D] matmul instead of two reads of the [B, T, D]
            # stream.  Column blocks of a wider gemm: identical math.
            dt = self.dtype
            w = jnp.concatenate(
                [self.q_proj.variables["params"]["kernel"],
                 self.k_proj.variables["params"]["kernel"]], axis=-1,
            ).astype(dt)
            b = jnp.concatenate(
                [self.q_proj.variables["params"]["bias"],
                 self.k_proj.variables["params"]["bias"]], axis=-1,
            ).astype(dt)
            qk = q_in.astype(dt) @ w + b
            q, k = qk[..., : self.dim], qk[..., self.dim :]
            v = self.v_proj(v_in)
            return self._attend_projected(q, k, v, bias, deterministic)
        k, v = self.project_kv(k_in, v_in)
        return self.attend(q_in, k, v, bias, deterministic)


class FeedForward(nn.Module):
    dim: int
    hidden: int
    dropout: float = 0.1
    activation: Callable = exact_gelu
    dtype: jnp.dtype = jnp.float32
    hash_dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="linear1")(x)
        h = self.activation(h)
        h = make_dropout(self.dropout, self.hash_dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)
        return h


def _maybe_rotate(x: jnp.ndarray, rotary: Optional[RotaryTable], offset=0) -> jnp.ndarray:
    return apply_rotary(x, rotary, offset) if rotary is not None else x


class FiLMDecoderLayer(nn.Module):
    """self-attn→FiLM → cross-attn(audio)→FiLM → [cross-attn₂(guide)→FiLM] →
    FF→FiLM, all pre-norm with residuals."""

    dim: int
    heads: int
    ff_size: int
    dropout: float = 0.1
    use_cm: bool = False  # second cross-attention memory (pose keyframes)
    dtype: jnp.dtype = jnp.float32
    flash: bool = False  # Pallas attention for the un-biased self/cross paths
    hash_dropout: bool = False  # fused position-hash masks (see hash_drop_mult)

    def setup(self):
        D, H = self.dim, self.heads
        self.self_attn = MultiHeadAttention(
            D, H, self.dropout, self.dtype, self.flash, name="self_attn"
        )
        self.cross_attn = MultiHeadAttention(
            D, H, self.dropout, self.dtype, self.flash, name="cross_attn"
        )
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, name="norm3", dtype=self.dtype)
        self.film1 = DenseFiLM(D, self.dtype, name="film1")
        self.film2 = DenseFiLM(D, self.dtype, name="film2")
        self.film3 = DenseFiLM(D, self.dtype, name="film3")
        self.ff = FeedForward(D, self.ff_size, self.dropout, dtype=self.dtype,
                              hash_dropout=self.hash_dropout, name="ff")
        self.drop = make_dropout(self.dropout, self.hash_dropout)
        if self.use_cm:
            self.cross_attn2 = MultiHeadAttention(D, H, self.dropout, self.dtype, name="cross_attn2")
            self.norm2a = nn.LayerNorm(epsilon=1e-5, name="norm2a", dtype=self.dtype)
            self.film2a = DenseFiLM(D, self.dtype, name="film2a")

    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        memory: jnp.ndarray,  # [B, Tm, D]
        t: jnp.ndarray,  # [B, D] FiLM conditioning vector
        deterministic: bool = True,  # positional so nn.remat can mark it static
        *,
        memory2: Optional[jnp.ndarray] = None,
        self_bias: Optional[jnp.ndarray] = None,
        rotary: Optional[RotaryTable] = None,
        x_offset=0,  # rotary position offset of x (KV-cache decode)
        cross_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        # already-projected cross K/V — the denoiser fuses ALL layers' cross
        # projections over the shared memory stream into two stacked matmuls
        # (film_transformer.denoise) instead of 2·L re-reads of [B, Tm, D]
    ) -> jnp.ndarray:
        h = self.norm1(x)
        qk = _maybe_rotate(h, rotary, x_offset)
        h = self.self_attn(qk, qk, h, self_bias, deterministic)
        h = self.drop(h, deterministic=deterministic)
        x = x + featurewise_affine(h, self.film1(t))

        h = self.norm2(x)
        q = _maybe_rotate(h, rotary, x_offset)
        if cross_kv is not None:
            h = self.cross_attn.attend(q, cross_kv[0], cross_kv[1], None, deterministic)
        else:
            k = _maybe_rotate(memory, rotary)
            h = self.cross_attn(q, k, memory, None, deterministic)
        h = self.drop(h, deterministic=deterministic)
        x = x + featurewise_affine(h, self.film2(t))

        if self.use_cm:
            h = self.norm2a(x)
            q = _maybe_rotate(h, rotary, x_offset)
            assert memory2 is not None, "use_cm layer requires memory2"
            k = _maybe_rotate(memory2, rotary)
            h = self.cross_attn2(q, k, memory2, None, deterministic)
            h = self.drop(h, deterministic=deterministic)
            x = x + featurewise_affine(h, self.film2a(t))

        h = self.norm3(x)
        h = self.ff(h, deterministic)
        h = self.drop(h, deterministic=deterministic)
        x = x + featurewise_affine(h, self.film3(t))
        return x

    # ------------------------------------------------------------ #
    # cached single-token decode
    # ------------------------------------------------------------ #

    def precompute_cross(self, memory: jnp.ndarray, rotary: Optional[RotaryTable]):
        """→ (cross_k, cross_v): constant across decode steps."""
        return self.cross_attn.project_kv(_maybe_rotate(memory, rotary), memory)

    def step(
        self,
        x_tok: jnp.ndarray,  # [B, 1, D] current token activation
        pos: jnp.ndarray,  # scalar int32 position
        self_k: jnp.ndarray,  # [B, L, D] cached projected self K
        self_v: jnp.ndarray,  # [B, L, D] cached self V
        cross_k: jnp.ndarray,
        cross_v: jnp.ndarray,
        t: jnp.ndarray,  # [B, D] FiLM vector
        rotary: Optional[RotaryTable],
    ):
        """One decode step → (out_tok [B,1,D], updated self_k, self_v)."""
        L = self_k.shape[1]
        h = self.norm1(x_tok)
        qk = _maybe_rotate(h, rotary, offset=pos)
        new_k, new_v = self.self_attn.project_kv(qk, h)
        self_k = jax.lax.dynamic_update_slice(self_k, new_k, (0, pos, 0))
        self_v = jax.lax.dynamic_update_slice(self_v, new_v, (0, pos, 0))
        # mask positions > pos
        valid = (jnp.arange(L) <= pos)[None, None, None, :]
        bias = jnp.where(valid, 0.0, NEG_INF)
        h = self.self_attn.attend(qk, self_k, self_v, bias)
        x = x_tok + featurewise_affine(h, self.film1(t))

        h = self.norm2(x)
        q = _maybe_rotate(h, rotary, offset=pos)
        h = self.cross_attn.attend(q, cross_k, cross_v, None)
        x = x + featurewise_affine(h, self.film2(t))

        h = self.norm3(x)
        h = self.ff(h, deterministic=True)
        x = x + featurewise_affine(h, self.film3(t))
        return x, self_k, self_v


class RotaryEncoderLayer(nn.Module):
    """Pre-norm encoder layer with the same pre-projection rotary trick
    (reference: TransformerEncoderLayerRotary)."""

    dim: int
    heads: int
    ff_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    flash: bool = False
    hash_dropout: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        bias: Optional[jnp.ndarray] = None,
        rotary: Optional[RotaryTable] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(x)
        qk = _maybe_rotate(h, rotary)
        h = MultiHeadAttention(self.dim, self.heads, self.dropout, self.dtype,
                               self.flash, name="self_attn")(
            qk, qk, h, bias, deterministic
        )
        h = make_dropout(self.dropout, self.hash_dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(x)
        h = FeedForward(self.dim, self.ff_size, self.dropout, dtype=self.dtype,
                        hash_dropout=self.hash_dropout, name="ff")(
            h, deterministic
        )
        h = make_dropout(self.dropout, self.hash_dropout)(h, deterministic=deterministic)
        return x + h
