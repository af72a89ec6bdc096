"""Probe 4: timings with a forced device→host scalar fetch per measurement —
immune to async-dispatch lies from the device tunnel."""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def t(fn, make_args, tag="", n=6):
    """fn must return a SCALAR (reduce inside the jit)."""
    c = jax.jit(fn)
    s = float(c(*make_args(0)))  # warmup + fetch
    arglist = [make_args(i + 1) for i in range(n)]
    jax.block_until_ready(arglist)
    t0 = time.perf_counter()
    acc = 0.0
    for a in arglist:
        acc += float(c(*a))  # fetch forces completion
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1000:.2f} ms (batch total, fetch-timed)", flush=True)
    return dt


def main():
    B = 4
    dt = jnp.bfloat16
    base512 = jax.random.normal(jax.random.PRNGKey(0), (B, 512, 512, 32), dt)
    base1k = jax.random.normal(jax.random.PRNGKey(1), (B, 1024, 1024, 32), dt)
    w33 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 32, 32), dt) * 0.05
    w33g = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16, 32), dt) * 0.05

    def conv_sum(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(y.astype(jnp.float32))

    t(conv_sum, lambda i: (base1k + jnp.bfloat16(i * 1e-3), w33),
      tag="conv3x3 dense @1024²")

    # fetch-only floor: how long does float(sum(x)) itself take?
    t(lambda x: jnp.sum(x.astype(jnp.float32)),
      lambda i: (base1k + jnp.bfloat16(i * 1e-3),), tag="sum-only floor @1024²")

    # closure variant for comparison (weights as HLO constants)
    t(lambda x: conv_sum(x, w33), lambda i: (base1k + jnp.bfloat16(i * 1e-3),),
      tag="conv3x3 dense @1024² (weights CLOSED OVER)")

    # the whole UpConvBlockDeep
    from audio2photoreal_tpu.render.blocks import UpConvBlockDeep
    from audio2photoreal_tpu.render.layers import render_compute_dtype

    blk = UpConvBlockDeep(32, 1024, groups=2)
    p = blk.init(jax.random.PRNGKey(4), base512)

    def run_sum(p, xs):
        with render_compute_dtype(jnp.bfloat16):
            return jnp.sum(blk.apply(p, xs).astype(jnp.float32))

    t(run_sum, lambda i: (p, base512 + jnp.bfloat16(i * 1e-3)),
      tag="UpConvBlockDeep @1024²")

    # and the block WITHOUT the untied biases / weight norm — isolate
    def upsample_matrix(H, Ho):
        pos = np.linspace(0.0, H - 1.0, Ho)
        i0 = np.clip(np.floor(pos).astype(int), 0, H - 1)
        i1 = np.minimum(i0 + 1, H - 1)
        w = np.clip(pos - i0, 0.0, 1.0)
        R = np.zeros((Ho, H), np.float32)
        R[np.arange(Ho), i0] += 1 - w
        R[np.arange(Ho), i1] += w
        return R

    R = jnp.asarray(upsample_matrix(512, 1024), dt)

    def pipeline_sum(x, R, w1, w2):
        y = jnp.einsum("oh,bhwc->bowc", R, x)
        y = jnp.einsum("ow,bhwc->bhoc", R, y)
        h = jax.lax.conv_general_dilated(
            y, w1, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        h = jax.nn.leaky_relu(h, 0.2)
        h = jax.lax.conv_general_dilated(
            h, w2, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(h.astype(jnp.float32))

    w2 = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 32, 32), dt) * 0.05
    t(pipeline_sum, lambda i: (base512 + jnp.bfloat16(i * 1e-3), R, w33, w2),
      tag="mm-resize + 2 dense convs @1024²")


if __name__ == "__main__":
    main()
