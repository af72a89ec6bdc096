"""Compiled flash-attention numerics + timing on the real chip."""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.ops.attention import dot_product_attention, padding_bias
from audio2photoreal_tpu.ops.pallas.flash import flash_attention

B, H, Tq, Tk, Dh = 64, 4, 600, 1998, 64
ks = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(ks[0], (B, H, Tq, Dh), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, H, Tk, Dh), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, H, Tk, Dh), jnp.bfloat16)
valid = (jnp.arange(Tk)[None, :] < 1600).astype(jnp.float32) * jnp.ones((B, 1))

f_flash = jax.jit(lambda q, k, v: flash_attention(q, k, v, kv_valid=valid))
f_ref = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, padding_bias(valid)))

o1 = np.asarray(f_flash(q, k, v), np.float32)
o2 = np.asarray(f_ref(q, k, v), np.float32)
print("max abs diff:", float(np.abs(o1 - o2).max()), flush=True)

K = 8
for name, f in (("flash", f_flash), ("einsum", f_ref)):
    g = jax.jit(lambda q, k, v: jax.lax.scan(
        lambda c, i: (jnp.sum(f(q + c.astype(q.dtype) * jnp.asarray(1e-6, q.dtype), k, v)[0, 0, 0]).astype(jnp.float32), None),
        jnp.float32(0.0), jnp.arange(K))[0])
    float(g(q, k, v))
    q2 = q + jnp.bfloat16(0.001)
    t0 = time.time(); float(g(q2, k, v))
    print(f"{name}: {(time.time()-t0)/K*1000:.2f} ms  (B{B} H{H} {Tq}x{Tk} d{Dh})", flush=True)

# ---- backward kernel vs oracle (no dropout) ------------------------------
from audio2photoreal_tpu.ops.pallas.flash import _xla_reference

def loss_flash(q, k, v):
    return jnp.sum(flash_attention(q, k, v, kv_valid=valid).astype(jnp.float32) ** 2)

def loss_ref(q, k, v):
    return jnp.sum(_xla_reference(q, k, v, valid, False).astype(jnp.float32) ** 2)

g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
for name, a, b in zip("qkv", g1, g2):
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    m = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
    print(f"d{name}: max abs diff {d:.4f} (ref max {m:.1f})", flush=True)

# ---- dropout replay: same seed → identical fwd; fd-grad check ------------
seed = jnp.array([17], jnp.int32)
fd = jax.jit(lambda q: flash_attention(q, k, v, kv_valid=valid, dropout_seed=seed,
                                       dropout_rate=0.1))
a = np.asarray(fd(q), np.float32)
b = np.asarray(fd(q), np.float32)
print("dropout fwd replay identical:", bool((a == b).all()), flush=True)
seed2 = jnp.array([18], jnp.int32)
c = np.asarray(jax.jit(lambda q: flash_attention(
    q, k, v, kv_valid=valid, dropout_seed=seed2, dropout_rate=0.1))(q), np.float32)
print("different seed differs:", float(np.abs(a - c).max()), flush=True)

# NOTE: a finite-difference check at these sizes is meaningless — the
# directional signal (~1e-4 relative) sits below the f32 loss-sum rounding
# noise, and a no-dropout control fails it identically.  The dropout
# GRADIENT math is validated exactly on CPU instead: the "hash" mask source
# is reconstructed outside the kernel and compared against an explicit-mask
# einsum oracle (tests/test_flash_attention.py::
# test_flash_dropout_kernel_grads_exact_vs_explicit_mask).

# ---- fwd+bwd timing vs einsum-with-dropout -------------------------------
from audio2photoreal_tpu.ops.attention import dot_product_attention as dpa

def train_like(f):
    def body(c, i):
        l, g = jax.value_and_grad(f)(q + c * 1e-6)
        return l + jnp.sum(g[0, 0, 0]).astype(jnp.float32) * 1e-12, None
    return jax.jit(lambda q0: jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))[0])

f_flash_d = lambda q_: jnp.sum(flash_attention(
    q_, k, v, kv_valid=valid, dropout_seed=seed, dropout_rate=0.1
).astype(jnp.float32) ** 2)
rng_d = jax.random.key(4, impl="rbg")
f_ein_d = lambda q_: jnp.sum(dpa(
    q_, k, v, padding_bias(valid), dropout_rate=0.1, dropout_rng=rng_d,
    deterministic=False).astype(jnp.float32) ** 2)
for name, f in (("flash fwd+bwd dropout", f_flash_d), ("einsum fwd+bwd dropout(rbg)", f_ein_d)):
    g = train_like(f)
    float(g(q)); q2 = q + jnp.bfloat16(0.002)
    t0 = time.time(); float(g(q2))
    print(f"{name}: {(time.time()-t0)/K*1000:.2f} ms", flush=True)
