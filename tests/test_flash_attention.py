"""ops/pallas/flash.py vs the einsum oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.ops.attention import causal_bias, dot_product_attention, padding_bias
from audio2photoreal_tpu.ops.pallas.flash import _xla_reference, flash_attention


def _qkv(B=2, H=2, Tq=13, Tk=37, Dh=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, H, Tq, Dh))
    k = jax.random.normal(ks[1], (B, H, Tk, Dh))
    v = jax.random.normal(ks[2], (B, H, Tk, Dh))
    return q, k, v


def test_flash_matches_einsum_plain():
    q, k, v = _qkv()
    out = flash_attention(q, k, v, block_q=8)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_key_padding_mask():
    q, k, v = _qkv(Tk=40)
    valid = (jnp.arange(40)[None, :] < jnp.array([[17], [40]])).astype(jnp.float32)
    out = flash_attention(q, k, v, kv_valid=valid, block_q=8)
    ref = dot_product_attention(q, k, v, padding_bias(valid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # padded keys must not leak: perturbing them changes nothing
    k2 = k.at[0, :, 17:, :].set(123.0)
    v2 = v.at[0, :, 17:, :].set(-55.0)
    out2 = flash_attention(q, k2, v2, kv_valid=valid, block_q=8)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=2e-5)


def test_flash_causal_square_and_rect():
    for Tq, Tk in [(24, 24), (12, 30)]:
        q, k, v = _qkv(Tq=Tq, Tk=Tk, seed=3)
        out = flash_attention(q, k, v, causal=True, block_q=8)
        ref = dot_product_attention(q, k, v, causal_bias(Tq, Tk))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5,
            err_msg=f"Tq={Tq} Tk={Tk}",
        )


def test_flash_odd_unpadded_shapes():
    # Dh and lengths far from the (8, 128) tiling grid
    q, k, v = _qkv(B=1, H=3, Tq=5, Tk=9, Dh=20, seed=4)
    out = flash_attention(q, k, v, block_q=8)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_grad_matches_einsum():
    q, k, v = _qkv(B=1, H=2, Tq=10, Tk=21, Dh=8, seed=5)
    valid = (jnp.arange(21)[None, :] < 15).astype(jnp.float32)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_valid=valid, block_q=8) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, valid, False) ** 2)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_flash_bf16():
    q, k, v = _qkv(Tq=16, Tk=32, seed=6)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, block_q=8)
    assert out.dtype == jnp.bfloat16
    ref = dot_product_attention(qb, kb, vb)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_flash_dropout_cpu_fallback_semantics():
    """dropout_rate > 0 off-TPU routes through the einsum path (the pltpu
    PRNG is TPU-only): zero-mean-preserving mask, deterministic in the seed,
    and differentiable."""
    q, k, v = _qkv(B=2, H=2, Tq=16, Tk=64, Dh=16, seed=7)
    seed = jnp.array([11], jnp.int32)

    f = lambda s: flash_attention(q, k, v, dropout_seed=s, dropout_rate=0.5, block_q=8)
    o1, o2 = f(seed), f(seed)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = f(jnp.array([12], jnp.int32))
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-4

    g = jax.grad(lambda q_: jnp.sum(
        flash_attention(q_, k, v, dropout_seed=seed, dropout_rate=0.5, block_q=8) ** 2
    ))(q)
    assert np.all(np.isfinite(np.asarray(g)))

    # expectation over seeds ≈ no-dropout output (unbiased masking)
    outs = [
        np.asarray(f(jnp.array([s], jnp.int32))) for s in range(40)
    ]
    ref = np.asarray(flash_attention(q, k, v, block_q=8))
    err = np.abs(np.mean(outs, axis=0) - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert err < 0.2, err  # 40 seeds at rate 0.5 — loose statistical sanity


def test_flash_zero_rate_equals_plain():
    q, k, v = _qkv(seed=8)
    a = flash_attention(q, k, v, dropout_seed=jnp.array([3], jnp.int32),
                        dropout_rate=0.0, block_q=8)
    b = flash_attention(q, k, v, block_q=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flash_dropout_kernel_grads_exact_vs_explicit_mask():
    """The in-kernel dropout gradient math, validated EXACTLY: with the
    pure-jnp "hash" mask source the kernel's mask is reconstructible outside,
    so an explicit-mask einsum oracle must match fwd AND grads."""
    from audio2photoreal_tpu.ops.pallas.flash import hash_mask_mult

    B, H, Tq, Tk, Dh, bq, rate = 1, 2, 16, 256, 16, 8, 0.3
    q, k, v = _qkv(B=B, H=H, Tq=Tq, Tk=Tk, Dh=Dh, seed=11)
    seed = jnp.array([23], jnp.int32)

    def f_flash(q, k, v):
        return flash_attention(
            q, k, v, dropout_seed=seed, dropout_rate=rate, block_q=bq,
            dropout_mask_impl="hash",
        )

    # reconstruct the kernel's per-block mask layout (grid = (B·H, Tq/bq))
    nj = Tq // bq
    rows = []
    for i in range(B * H):
        blocks = [
            hash_mask_mult(seed[0], i * nj + j, (bq, Tk), rate) for j in range(nj)
        ]
        rows.append(jnp.concatenate(blocks, axis=0))
    mask = jnp.stack(rows).reshape(B, H, Tq, Tk)

    def f_oracle(q, k, v):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(Dh))
        p = jax.nn.softmax(logits, axis=-1) * mask
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    out_f = f_flash(q, k, v)
    out_o = f_oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_o), atol=3e-5)

    loss_f = lambda *a: jnp.sum(f_flash(*a) ** 2)
    loss_o = lambda *a: jnp.sum(f_oracle(*a) ** 2)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_denoiser_flash_matches_einsum():
    """DenoiserConfig.flash_attention=True swaps the decoder stack's
    attention onto the Pallas kernel — deterministic forward must match the
    einsum path (same params) to f32-accumulation tolerance."""
    import dataclasses

    from audio2photoreal_tpu.core.config import DenoiserConfig
    from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser

    cfg = DenoiserConfig(
        data_format="pose", nfeats=8, latent_dim=16, ff_size=32,
        num_layers=2, num_heads=2, max_seq_length=128, keyframe_step=32,
    )
    m0 = FiLMDenoiser(cfg)
    m1 = FiLMDenoiser(dataclasses.replace(cfg, flash_attention=True))
    B, T = 2, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 8))
    t = jnp.zeros((B,), jnp.int32)
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T * 1600, 2)) * 0.1
    kf = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 104))
    kv = jnp.ones((B, 4))
    params = m0.init(
        {"params": jax.random.PRNGKey(3), "cond_drop": jax.random.PRNGKey(4)},
        x, t, audio, kf, kv,
    )
    out0 = m0.apply(params, x, t, audio, kf, kv)
    out1 = m1.apply(params, x, t, audio, kf, kv)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=3e-4)
