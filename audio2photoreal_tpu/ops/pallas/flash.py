"""Memory-efficient attention as a Pallas TPU kernel.

The XLA einsum attention in ``ops/attention.py`` materialises the logits
[B, H, Tq, Tk] in HBM — at the denoiser's shapes (B 64, H 4, Tq 600,
Tk ~2000 audio tokens) that is ~1.2 GB of f32 per cross-attention layer,
and the softmax chain is HBM-bound.  This kernel keeps the whole K/V of one
(batch, head) resident in VMEM (Tk·Dh ≤ a few hundred KB at these sizes) and
computes each q-block's logits, softmax, and value reduction entirely
on-chip: HBM sees only q, k, v, and the output.

This is the "blockwise attention" long-context hook promised in
ops/attention.py — a single-pass VMEM-resident design rather than a full
online-softmax flash kernel, which is the right trade at Tk ≤ ~8k (K/V fit
in VMEM; an online m/l carry would only add VPU work).

Differentiation: ``flash_attention`` carries a ``jax.custom_vjp`` whose
backward recomputes probabilities with the plain einsum path — the fwd is
memory-light, and training (which also wants attention-prob dropout, not
supported here) keeps using ``dot_product_attention`` anyway.

Reference semantics being replaced: torch.nn.MultiheadAttention inside
FiLMTransformerDecoderLayer (reference model/modules/transformer_modules.py:
127-268) — numerics match ``dot_product_attention`` (f32 logits/softmax) to
~1e-6 f32 / bf16 rounding (tests/test_flash_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too; guard for safety
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

NEG_INF = -1e9


def _attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, causal, bq, tk, causal_offset
):
    """One (batch·head, q-block) cell: full-Tk logits in VMEM.

    q_ref: [1, bq, Dp]   k_ref/v_ref: [1, Tkp, Dp]   bias_ref: [1, 1, Tkp]
    o_ref: [1, bq, Dp]
    """
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, Tkp]
    logits = logits * scale + bias_ref[0]  # bias block [1, Tkp] broadcasts
    if causal:
        # same alignment as ops/attention.causal_bias: key j attendable when
        # j <= i + (Tk - Tq), positions in UNPADDED coordinates
        j = pl.program_id(1)
        qpos = j * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 1)
        logits = jnp.where(kpos <= qpos + causal_offset, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _flash_fwd(
    q: jnp.ndarray,  # [B, H, Tq, Dh]
    k: jnp.ndarray,  # [B, H, Tk, Dh]
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray],  # [B, Tk] 1=valid (None = all valid)
    causal: bool,
    bq: int,
    interpret: bool,
) -> jnp.ndarray:
    B, H, Tq, Dh = q.shape
    Tk = k.shape[2]
    scale = 1.0 / (Dh**0.5)

    # lane/sublane-friendly padding: Dh → 128 lanes, Tq → q-block, Tk → 128
    q_p = _pad_to(_pad_to(q, 3, 128), 2, bq).reshape(B * H, -1, max(Dh, 128))
    k_p = _pad_to(_pad_to(k, 3, 128), 2, 128).reshape(B * H, -1, max(Dh, 128))
    v_p = _pad_to(_pad_to(v, 3, 128), 2, 128).reshape(B * H, -1, max(Dh, 128))
    Tqp, Tkp = q_p.shape[1], k_p.shape[1]

    if kv_valid is None:
        kv_valid = jnp.ones((B, Tk), jnp.float32)
    bias = jnp.where(kv_valid > 0, 0.0, NEG_INF).astype(jnp.float32)
    bias = _pad_to(bias, 1, 128, value=NEG_INF)  # padded keys masked out
    # expand to one row per (batch, head): Mosaic block shapes must tile
    # (8, 128) or span the dim, and a floor-divide index map is rejected —
    # 2 MB of replicated bias is cheaper than fighting either constraint
    bias = jnp.repeat(bias[:, None, :], H, axis=1).reshape(B * H, 1, -1)

    grid = (B * H, Tqp // bq)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, causal=causal, bq=bq, tk=Tkp,
            causal_offset=Tk - Tq,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, q_p.shape[2]), lambda i, j: (i, j, 0), memory_space=_VMEM),
            pl.BlockSpec((1, Tkp, k_p.shape[2]), lambda i, j: (i, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, Tkp, v_p.shape[2]), lambda i, j: (i, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, 1, Tkp), lambda i, j: (i, 0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, q_p.shape[2]), lambda i, j: (i, j, 0), memory_space=_VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(q_p.shape, q.dtype),
        interpret=interpret,
    )(q_p, k_p, v_p, bias)
    return out.reshape(B, H, Tqp, -1)[:, :, :Tq, :Dh]


def _xla_reference(q, k, v, kv_valid, causal):
    """Plain einsum attention with identical masking semantics (used by the
    custom-vjp backward and as the numerics oracle in tests)."""
    from audio2photoreal_tpu.ops.attention import causal_bias, dot_product_attention, padding_bias

    bias = None
    if kv_valid is not None:
        bias = padding_bias(kv_valid)
    if causal:
        cb = causal_bias(q.shape[2], k.shape[2])
        bias = cb if bias is None else bias + cb
    return dot_product_attention(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,
    causal: bool = False,
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """VMEM-resident attention: [B, H, Tq, Dh] × [B, H, Tk, Dh] → [B, H, Tq, Dh].

    ``kv_valid`` is a [B, Tk] key-validity mask (1=attendable).  ``interpret``
    defaults to auto: compiled on TPU, interpreter elsewhere (CPU tests)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bq = min(block_q, max(8, q.shape[2]))
    return _flash_fwd(q, k, v, kv_valid, causal, bq, interpret)


def _fwd(q, k, v, kv_valid, causal, block_q, interpret):
    out = flash_attention(q, k, v, kv_valid, causal, block_q, interpret)
    return out, (q, k, v, kv_valid)


def _bwd(causal, block_q, interpret, res, g):
    q, k, v, kv_valid = res
    # recompute-through-XLA backward: correct and simple; training uses the
    # einsum path anyway (attention-prob dropout lives there)
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, kv_valid, causal), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
