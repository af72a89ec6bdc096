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
        lambda c, i: (jnp.sum(f(q + c * 1e-6, k, v)[0, 0, 0]).astype(jnp.float32), None),
        jnp.float32(0.0), jnp.arange(K))[0])
    float(g(q, k, v))
    q2 = q + jnp.bfloat16(0.001)
    t0 = time.time(); float(g(q2, k, v))
    print(f"{name}: {(time.time()-t0)/K*1000:.2f} ms  (B{B} H{H} {Tq}x{Tk} d{Dh})", flush=True)
