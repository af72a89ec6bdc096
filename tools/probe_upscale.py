"""UpscaleNet internals: which part of the 3 ms/frame is conv vs relayout."""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.layers import (
    depth_to_space, pixel_shuffle, render_compute_dtype, space_to_depth,
)
from audio2photoreal_tpu.render.blocks import UpscaleNet

B, K, S = 16, 8, 1024
rng = np.random.RandomState(0)
x6 = jnp.asarray(rng.randn(B, S, S, 6).astype(np.float32) * 0.1, jnp.bfloat16)
h12 = jnp.asarray(rng.randn(B, S, S, 12).astype(np.float32) * 0.1, jnp.bfloat16)

net = UpscaleNet(out_channels=3, n_ftrs=16, size=S)
params = jax.jit(net.init)(jax.random.PRNGKey(0), x6)


def chain(name, body, *args):
    f = jax.jit(lambda p, *a: jax.lax.scan(
        lambda c, _: (body(c, p, *a), None), jnp.float32(0.0), None, length=K)[0])
    float(f(params, *args))  # warmup; the scalar must be FETCHED (the tunnel
    # defers execution until a fetch, and serves repeated identical calls
    # from a result cache) — time with fresh argument values
    args2 = tuple(a + jnp.bfloat16(0.25) for a in args)
    t0 = time.time(); float(f(params, *args2))
    print(f"{name}: {(time.time()-t0)/K/B*1000:.2f} ms/frame", flush=True)


def tap(y):
    return jnp.sum(y.astype(jnp.float32))


with render_compute_dtype(jnp.bfloat16):
    chain("full upscale_net", lambda c, p, a: tap(
        net.apply(p, a + c.astype(jnp.bfloat16) * 1e-3)), x6)
    chain("pixel_shuffle only", lambda c, p, a: tap(
        pixel_shuffle(a + c.astype(jnp.bfloat16) * 1e-3, 2)), h12)
    chain("s2d+d2s only", lambda c, p, a: tap(
        depth_to_space(space_to_depth(a + c.astype(jnp.bfloat16) * 1e-3))), x6)
