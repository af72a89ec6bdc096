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
