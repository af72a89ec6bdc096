"""Isolate the three flash-attention shapes inside the bs-64 face train step
(VERDICT r3 next #3): decoder self (Tq=Tk=600), decoder cross (600 x 1998),
cond-encoder self (1998 x 1998) — fwd and fwd+bwd, at bench dtype (bf16,
dh=128, H=4), each scan-chained K times inside one jit with fresh values.

Also times the two big non-attention matmul families at face shapes for the
roofline table: the d=512 layer projections (QKVO-equivalent GEMM) and the
ff=1024 MLP.

Usage: python tools/probe_face_attn_shapes.py [B]
"""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.ops.pallas.flash import flash_attention

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
H, DH, D, FF = 4, 128, 512, 1024
K = 8
rng = np.random.RandomState(0)


def chain(name, f, *args):
    """scan-chain f K times inside one jit; report per-iter ms."""

    def body(c, _):
        return f(c, *args), 0

    g = jax.jit(lambda c: jax.lax.scan(body, c, None, length=K)[0])
    c0 = jnp.float32(0.0)
    try:
        jax.block_until_ready(g(c0))
        t0 = time.time()
        out = g(c0)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / K * 1000
        print(f"{name}: {dt:.1f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


def mk(Tq, Tk):
    q = jnp.asarray(rng.randn(B, H, Tq, DH).astype(np.float32) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, Tk, DH).astype(np.float32) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, Tk, DH).astype(np.float32) * 0.1, jnp.bfloat16)
    return q, k, v


def attn_fwd(q, k, v):
    def f(c, q, k, v):
        o = flash_attention(q + c.astype(q.dtype) * 1e-6, k, v)
        return c + jnp.sum(o[:, 0, 0, 0]).astype(jnp.float32) * 1e-9

    return f, (q, k, v)


def attn_fwd_bwd(q, k, v):
    def f(c, q, k, v):
        def loss(q_):
            o = flash_attention(q_, k, v)
            return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6

        val, gq = jax.value_and_grad(loss)(q + c.astype(q.dtype) * 1e-6)
        return c + (val + jnp.sum(gq.astype(jnp.float32) ** 2)) * 1e-9

    return f, (q, k, v)


shapes = [("self 600", 600, 600), ("cross 600x1998", 600, 1998),
          ("enc-self 1998", 1998, 1998)]
for name, Tq, Tk in shapes:
    q, k, v = mk(Tq, Tk)
    flops_fwd = 4 * B * H * Tq * Tk * DH  # QK^T + AV, 2 FLOPs/MAC
    f, a = attn_fwd(q, k, v)
    chain(f"flash fwd {name} ({flops_fwd/1e9:.0f} GF)", f, *a)
    f, a = attn_fwd_bwd(q, k, v)
    chain(f"flash fwd+bwd {name} ({flops_fwd*3.5/1e9:.0f} GF)", f, *a)

# matmul roofline anchors at face shapes
x600 = jnp.asarray(rng.randn(B * 600, D).astype(np.float32) * 0.1, jnp.bfloat16)
x1998 = jnp.asarray(rng.randn(B * 1998, D).astype(np.float32) * 0.1, jnp.bfloat16)
w4 = jnp.asarray(rng.randn(D, 4 * D).astype(np.float32) * 0.02, jnp.bfloat16)
wff = jnp.asarray(rng.randn(D, FF).astype(np.float32) * 0.02, jnp.bfloat16)


def gemm(c, x, w):
    y = (x + c.astype(x.dtype) * 1e-6) @ w
    return c + jnp.sum(y[0]).astype(jnp.float32) * 1e-9


chain(f"gemm [B*600,512]x[512,2048] ({2*B*600*D*4*D/1e9:.0f} GF)", gemm, x600, w4)
chain(f"gemm [B*1998,512]x[512,2048] ({2*B*1998*D*4*D/1e9:.0f} GF)", gemm, x1998, w4)
chain(f"gemm [B*600,512]x[512,1024] ({2*B*600*D*FF/1e9:.0f} GF)", gemm, x600, wff)
