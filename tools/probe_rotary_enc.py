"""Why is a cond_encoder layer ~2x slower per token than a decoder layer?
Variants of the rotary encoder layer at the face-cond shape (B=64, T~1000,
D=512), scan-chained (NOTES_ROUND3 probe hygiene)."""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.models.blocks import MultiHeadAttention, FeedForward
from audio2photoreal_tpu.ops.rotary import RotaryTable, make_rotary_table, apply_rotary

B, T, D, H, FF = 64, 999, 512, 4, 1024
K = 8
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.1, jnp.bfloat16)
rot = make_rotary_table(D, T + 8)
rot_bf16 = RotaryTable(cos=rot.cos.astype(jnp.bfloat16), sin=rot.sin.astype(jnp.bfloat16))

attn = MultiHeadAttention(D, H, 0.0, jnp.bfloat16, True)
aparams = attn.init(jax.random.PRNGKey(0), x, x, x, None, True)
ff = FeedForward(D, FF, 0.0, dtype=jnp.bfloat16)
fparams = ff.init(jax.random.PRNGKey(1), x, True)


def chain(name, body):
    try:
        f = jax.jit(lambda xx: jax.lax.scan(
            lambda c, _: (c + body(xx + c.astype(jnp.bfloat16) * jnp.asarray(1e-6, jnp.bfloat16)), None),
            jnp.float32(0.0), None, length=K)[0])
        float(f(x))
        x2 = x + jnp.asarray(0.01, x.dtype)
        t0 = time.time(); float(f(x2))
        print(f"{name}: {(time.time()-t0)/K*1000:.1f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


def rotate_reshape(xx, table):
    Tq, Dq = xx.shape[-2], xx.shape[-1]
    cos = table.cos[:Tq, :Dq].astype(xx.dtype)
    sin = table.sin[:Tq, :Dq].astype(xx.dtype)
    p = xx.reshape(xx.shape[:-1] + (Dq // 2, 2))
    rot = jnp.stack([-p[..., 1], p[..., 0]], axis=-1).reshape(xx.shape)
    return xx * cos + rot * sin


chain("attn only (no rotary)", lambda xx: jnp.sum(
    attn.apply(aparams, xx, xx, xx, None, True)[:, 0, 0]).astype(jnp.float32))

chain("rotate (current f32 tables + stride-2)", lambda xx: jnp.sum(
    apply_rotary(xx, rot)[:, 0, 0]).astype(jnp.float32))

chain("rotate (bf16 tables, stride-2)", lambda xx: jnp.sum(
    apply_rotary(xx, rot_bf16)[:, 0, 0]).astype(jnp.float32))

chain("rotate (bf16 tables, reshape-pairs)", lambda xx: jnp.sum(
    rotate_reshape(xx, rot)[:, 0, 0]).astype(jnp.float32))

chain("attn(rotated) current", lambda xx: jnp.sum(
    attn.apply(aparams, apply_rotary(xx, rot), apply_rotary(xx, rot), xx, None, True)[:, 0, 0]
).astype(jnp.float32))


def qk_once(xx):
    qk = apply_rotary(xx, rot)
    return jnp.sum(attn.apply(aparams, qk, qk, xx, None, True)[:, 0, 0]).astype(jnp.float32)


chain("attn(rotated) qk computed once", qk_once)

chain("ff only", lambda xx: jnp.sum(
    ff.apply(fparams, xx, True)[:, 0, 0]).astype(jnp.float32))

# einsum attention at this shape for comparison
attn_e = MultiHeadAttention(D, H, 0.0, jnp.bfloat16, False)
chain("attn einsum (no rotary)", lambda xx: jnp.sum(
    attn_e.apply(aparams, xx, xx, xx, None, True)[:, 0, 0]).astype(jnp.float32))


# ---- backward variants: where does bwd go pathological? ----
def g(name, fn):
    chain(name, lambda xx: jnp.sum(jax.grad(
        lambda z: jnp.sum(fn(z).astype(jnp.float32))
    )(xx)[:, 0, 0]).astype(jnp.float32))


g("bwd rotate current", lambda z: apply_rotary(z, rot))
g("bwd rotate reshape-pairs", lambda z: rotate_reshape(z, rot))
g("bwd attn only", lambda z: attn.apply(aparams, z, z, z, None, True))
g("bwd attn(rotated) current", lambda z: attn.apply(
    aparams, apply_rotary(z, rot), apply_rotary(z, rot), z, None, True))


def qk_once_f(z):
    qk = apply_rotary(z, rot)
    return attn.apply(aparams, qk, qk, z, None, True)


g("bwd attn(rotated) qk once", qk_once_f)


def qk_once_reshape(z):
    qk = rotate_reshape(z, rot)
    return attn.apply(aparams, qk, qk, z, None, True)


g("bwd attn(rotated reshape)", qk_once_reshape)
g("bwd ff only", lambda z: ff.apply(fparams, z, True))
