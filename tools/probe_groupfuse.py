"""Grouped conv (2 groups) as two dense convs vs ONE block-diagonal conv.

The decoder's verts/tex split runs groups=2 convs as two per-group dense
convs (layers._s2d_grouped) — each 64ch in s2d coords, i.e. half the vector
lanes.  A single conv with a block-diagonal kernel doubles the MACs but
fills the lanes and avoids splitting the tensor.  B=16, bf16, scan-chained
with fresh-arg fetch (tunnel timing rules)."""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

B, K = 16, 8
rng = np.random.RandomState(0)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timeit(name, f, *args):
    g = jax.jit(f)
    float(g(*args))
    args2 = tuple(a + jnp.bfloat16(0.25) for a in args)
    t0 = time.time(); float(g(*args2))
    print(f"{name}: {(time.time()-t0)/K/B*1000:.2f} ms/frame", flush=True)


def case(S, cg_in, cg_out):
    # s2d-coordinate shapes: per-group channels are 4x the raw count
    x = jnp.asarray(rng.randn(B, S, S, 2 * cg_in).astype(np.float32) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(3, 3, cg_in, cg_out).astype(np.float32) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, cg_in, cg_out).astype(np.float32) * 0.05, jnp.bfloat16)
    wbd = np.zeros((3, 3, 2 * cg_in, 2 * cg_out), np.float32)
    wbd[:, :, :cg_in, :cg_out] = np.asarray(w1, np.float32)
    wbd[:, :, cg_in:, cg_out:] = np.asarray(w2, np.float32)
    wbd = jnp.asarray(wbd, jnp.bfloat16)

    def two(x):
        def body(c, _):
            xc = x + 1e-3 * jnp.sin(x + c.astype(jnp.bfloat16))
            a = conv(xc[..., :cg_in], w1)
            b = conv(xc[..., cg_in:], w2)
            return jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=K)[0]

    def one(x):
        def body(c, _):
            xc = x + 1e-3 * jnp.sin(x + c.astype(jnp.bfloat16))
            y = conv(xc, wbd)
            return jnp.sum(y.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=K)[0]

    timeit(f"2x dense {cg_in}->{cg_out} @{S}^2", two, x)
    timeit(f"1x blockdiag {2*cg_in}->{2*cg_out} @{S}^2", one, x)


case(512, 64, 64)    # up3 @1024^2 raw (16->16/group) in s2d coords
case(256, 128, 64)   # up2 @512^2 raw (32->16/group) in s2d coords
