"""Cost of the s2d/d2s/resize/texel-major relayouts at the decoder-tail
shapes — the candidates for elimination by keeping the tail in s2d coords."""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.layers import (
    _interp_matrix,
    depth_to_space,
    resize_bilinear,
    space_to_depth,
)
from audio2photoreal_tpu.render.seams import to_texel_rows

B, K = 16, 8
dt = jnp.bfloat16
rng = np.random.RandomState(0)
x1k = jnp.asarray(rng.randn(B, 1024, 1024, 32).astype(np.float32) * 0.1, dt)
x512 = jnp.asarray(rng.randn(B, 512, 512, 128).astype(np.float32) * 0.1, dt)
x512d = jnp.asarray(rng.randn(B, 512, 512, 32).astype(np.float32) * 0.1, dt)
x256 = jnp.asarray(rng.randn(B, 256, 256, 128).astype(np.float32) * 0.1, dt)


def chain(name, body, *args):
    def run(*a):
        def step(c, i):
            return jnp.float32(body(i, *a)), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))[0]

    c = jax.jit(run)
    float(c(*args))
    pert = tuple((x + jnp.asarray(0.25, x.dtype)) for x in args)
    t0 = time.time()
    float(c(*pert))
    print(f"{name}: {(time.time() - t0) / K / B * 1000:.2f} ms/frame", flush=True)


tap = lambda v: jnp.sum(v[:, ::64, ::64].astype(jnp.float32)) if v.ndim == 4 else jnp.sum(v[::4096].astype(jnp.float32))

chain("s2d @1024²x32", lambda i, x: tap(space_to_depth(x + i.astype(dt) * jnp.asarray(1e-4, dt))), x1k)
chain("d2s @512²x128", lambda i, x: tap(depth_to_space(x + i.astype(dt) * jnp.asarray(1e-4, dt))), x512)
chain("resize dense 512->1024 @32 (ac=True)", lambda i, x: tap(
    resize_bilinear(x + i.astype(dt) * jnp.asarray(1e-4, dt), (1024, 1024), align_corners=True)), x512d)
chain("to_texel_rows @1024²x32", lambda i, x: tap(to_texel_rows(x + i.astype(dt) * jnp.asarray(1e-4, dt))), x1k)


# prototype: 2x up (align_corners=True) entirely in s2d coords via two einsums
RyP = jnp.asarray(
    _interp_matrix(512, 1024, True).reshape(512, 2, 512, 2).transpose(0, 1, 2, 3), dt
)
RxP = RyP


def resize_s2d_proto(i, x):
    x = x + i.astype(dt) * jnp.asarray(1e-4, dt)
    Bx, h, w, CP = x.shape
    C = CP // 4
    x7 = x.reshape(Bx, h, w, 2, 2, C)
    y1 = jnp.einsum("ORiq,biwqxc->bORwxc", RyP, x7)
    y2 = jnp.einsum("PSjx,bORjxc->bOPRSc", RxP, y1)
    return tap(y2.reshape(Bx, 512, 512, 4 * C))


chain("resize_s2d 256->512(s2d coords) @128", resize_s2d_proto, x256)
