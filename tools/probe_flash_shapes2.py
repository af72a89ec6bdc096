"""Flash-kernel throughput at the face-model attention shapes (round-4 margin
hunt): scan-chained inside one jit, device-put inputs (naively baking ~100 MB
of constants into the jaxpr trips the axon tunnel's compile-request size cap
— the earlier probe's HTTP 413s), fresh values on the timed call.

Usage: python tools/probe_flash_shapes2.py [block_q or 'auto'] ...
Prints TF/s for fwd and fwd+bwd at self-600, cross-600x1998, encself-1998.
"""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.ops.pallas.flash import flash_attention

B, H, Dh = 64, 4, 128
K = 8
rng = np.random.RandomState(0)
bqs = sys.argv[1:] or ["auto"]


def run(name, Tq, Tk, bq_arg, dropout):
    bq = None if bq_arg == "auto" else int(bq_arg)
    q = jax.device_put(rng.randn(B, H, Tq, Dh).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    k = jax.device_put(rng.randn(B, H, Tk, Dh).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    v = jax.device_put(rng.randn(B, H, Tk, Dh).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)
    fl = 4.0 * B * H * Tq * Tk * Dh * K

    def att(args):
        q_, k_, v_ = args
        return flash_attention(q_, k_, v_, None, seed, False, dropout, bq)

    def fwd(qkv):
        def body(c, _):
            o = att((qkv[0] + c * 1e-6, qkv[1], qkv[2]))
            return jnp.float32(o.astype(jnp.float32).mean()), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=K)[0]

    def fwdbwd(qkv):
        def body(c, _):
            def loss(args):
                return att(args).astype(jnp.float32).mean()
            g = jax.grad(loss)((qkv[0] + c * 1e-6, qkv[1], qkv[2]))
            return jnp.float32(g[0].astype(jnp.float32).mean()), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=K)[0]

    for tag, f, fl_mult in (("fwd", fwd, 1.0), ("fwd+bwd", fwdbwd, 3.5)):
        try:
            jf = jax.jit(f)
            float(jf((q, k, v)))
            q2 = q + jnp.bfloat16(1e-3)
            t0 = time.time(); float(jf((q2, k, v))); dt = time.time() - t0
            tf = fl * fl_mult / dt / 1e12
            print(f"{name} bq={bq_arg} drop={dropout} {tag}: "
                  f"{dt/K*1000:.2f} ms/it  {tf:.1f} TF/s", flush=True)
        except Exception as e:
            print(f"{name} bq={bq_arg} drop={dropout} {tag}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


for bq_arg in bqs:
    for name, Tq, Tk in (
        ("self-600", 600, 600),
        ("cross-600x1998", 600, 1998),
        ("encself-1998", 1998, 1998),
    ):
        for dropout in (0.0, 0.1):
            run(name, Tq, Tk, bq_arg, dropout)
