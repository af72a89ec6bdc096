"""Is a second space-to-depth level worth it?

NOTE: the perturbation must be NONLINEAR in the input — conv is linear, so
conv(x + c*eps) hoists to conv(x) + c*conv(eps) outside the scan and the
chain reads 0.00 ms (axon timing hazard #3 was partly THIS).  Times equal-FLOPs convs:
the current s2d1 shape (512², 64ch) vs the s2d2 shape (256², 256ch) vs the
raw shape (1024², 16ch).  B=16, bf16, scan-chained."""
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


def chain(name, S, C, kh=3, kw=3):
    x = jnp.asarray(rng.randn(B, S, S, C).astype(np.float32) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(kh, kw, C, C).astype(np.float32) * 0.05, jnp.bfloat16)

    def body(c, _):
        y = conv(x + c.astype(jnp.bfloat16) * 1e-3, w)
        return jnp.sum(y.astype(jnp.float32)), None

    f = jax.jit(lambda a, ww: jax.lax.scan(
        lambda c, _: ((lambda y: jnp.sum(y.astype(jnp.float32)))(
            conv(a + 1e-3 * jnp.sin(a + c.astype(jnp.bfloat16)), ww)), None),
        jnp.float32(0.0), None, length=K)[0])
    float(f(x, w))  # warmup + compile; fetch forces execution on the tunnel
    # the tunnel serves REPEATED identical calls from a result cache (reads
    # ~0 ms) — every timed call must use fresh argument values, and the
    # scalar must be FETCHED (block_until_ready alone defers)
    x2 = x + jnp.bfloat16(0.25)
    t0 = time.time(); float(f(x2, w))
    dt = (time.time() - t0) / K / B * 1000
    gf = 2 * S * S * kh * kw * C * C / 1e9
    print(f"{name}: {dt:.2f} ms/frame ({gf:.1f} GF/frame, {gf/dt:.0f} GF/ms)", flush=True)


chain("raw    1024^2 x 16ch", 1024, 16)
chain("s2d^1   512^2 x 64ch", 512, 64)
chain("s2d^2   256^2 x 256ch", 256, 256, 2, 2)  # composed kernel shrinks to ~2x2
chain("s2d^2k3 256^2 x 256ch", 256, 256, 3, 3)  # upper bound if kernel stays 3x3
