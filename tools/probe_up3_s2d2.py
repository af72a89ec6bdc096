"""up3 + final-conv s2d-level experiments (round 3).

The decoder stage split (probe_decoder3) shows up3 6.96 + seam 2.03 +
final conv 2.96 = 12 of 13.3 ms/frame.  The final conv in s2d1 has 24 of 128
output lanes; up3's convs run 64/group.  Try level 2 on each in isolation and
in the full decoder."""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.blocks import UpConvBlockDeep
from audio2photoreal_tpu.render.layers import (
    conv3x3_s2d,
    conv3x3_s2d2,
    depth_to_space,
    render_compute_dtype,
    space_to_depth,
)

B, K = 16, 6
dt = jnp.bfloat16
rng = np.random.RandomState(0)
x512 = jnp.asarray(rng.randn(B, 512, 512, 32).astype(np.float32) * 0.1, dt)
x1k = jnp.asarray(rng.randn(B, 1024, 1024, 32).astype(np.float32) * 0.1, dt)
w6 = jnp.asarray(rng.randn(3, 3, 32, 6).astype(np.float32) * 0.05, dt)


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


def final_s2d1(i, x):
    x = x + i.astype(dt) * jnp.asarray(1e-4, dt)
    out = conv3x3_s2d(space_to_depth(x), w6)
    out = depth_to_space(out)
    return jnp.sum(out[:, ::128, ::128].astype(jnp.float32))


def final_s2d2(i, x):
    x = x + i.astype(dt) * jnp.asarray(1e-4, dt)
    out = conv3x3_s2d2(space_to_depth(space_to_depth(x)), w6)
    out = depth_to_space(depth_to_space(out))
    return jnp.sum(out[:, ::128, ::128].astype(jnp.float32))


def up3_lvl(lvl):
    blk = UpConvBlockDeep(32, 1024, groups=2, s2d_level=lvl, name="up3")
    p = blk.init(jax.random.PRNGKey(1), x512[:1])

    def body(i, x):
        with render_compute_dtype(dt):
            h = blk.apply(p, x + i.astype(dt) * jnp.asarray(1e-4, dt))
            return jnp.sum(h[:, ::128, ::128].astype(jnp.float32))

    chain(f"up3 s2d_level={lvl}", body, x512)


chain("final conv s2d1 (as shipped)", final_s2d1, x1k)
chain("final conv s2d2", final_s2d2, x1k)
up3_lvl(1)
up3_lvl(2)
