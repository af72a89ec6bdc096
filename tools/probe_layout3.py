"""Probe 3: honest timings — vary the input every iteration so no layer of
the stack (XLA, runtime, device tunnel) can replay a cached result."""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def t(fn, make_args, tag="", n=8):
    c = jax.jit(fn)
    args0 = make_args(0)
    out = c(*args0)
    jax.block_until_ready(out)
    arglist = [make_args(i + 1) for i in range(n)]
    jax.block_until_ready(arglist)
    t0 = time.perf_counter()
    for a in arglist:
        out = c(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1000:.2f} ms (batch total)", flush=True)
    return dt


def main():
    B = 4
    dt = jnp.bfloat16
    base512 = jax.random.normal(jax.random.PRNGKey(0), (B, 512, 512, 32), dt)
    base1k = jax.random.normal(jax.random.PRNGKey(1), (B, 1024, 1024, 32), dt)
    w33 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 32, 32), dt) * 0.05

    def vary1k(i):
        return (base1k + jnp.bfloat16(i * 0.001), w33)

    def conv_nhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    t(conv_nhwc, vary1k, tag="conv3x3 dense 32->32 @1024² (varying input)")

    w33g = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16, 32), dt) * 0.05

    def conv_grouped(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
        )

    t(conv_grouped, lambda i: (base1k + jnp.bfloat16(i * 0.001), w33g),
      tag="conv3x3 grouped(fg=2) @1024² (varying input)")

    from audio2photoreal_tpu.render.layers import _grouped_conv

    t(lambda x, w: _grouped_conv(x, w, 1, 1, 2),
      lambda i: (base1k + jnp.bfloat16(i * 0.001), w33g),
      tag="conv3x3 split-groups @1024² (varying input)")

    from audio2photoreal_tpu.render.layers import resize_bilinear

    t(lambda x: resize_bilinear(x, (1024, 1024), align_corners=True),
      lambda i: (base512 + jnp.bfloat16(i * 0.001),),
      tag="resize take-based 512->1024 (varying input)")

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

    def resize_mm(x, R):
        y = jnp.einsum("oh,bhwc->bowc", R, x)
        return jnp.einsum("ow,bhwc->bhoc", R, y)

    t(resize_mm, lambda i: (base512 + jnp.bfloat16(i * 0.001), R),
      tag="resize as matmuls (varying input)")

    # elementwise floor checks
    t(lambda x: x * 1.5 + 0.5, lambda i: (base1k + jnp.bfloat16(i * 0.001),),
      tag="elementwise @1024²x32 (varying input)")


if __name__ == "__main__":
    main()
