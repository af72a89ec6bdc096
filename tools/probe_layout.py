"""Probe: lane-efficient layouts for narrow-channel 1024² convs.

The decoder's last pyramid level ([B, 1024, 1024, 32]) is lane-bound: C=32
fills a quarter of the 128 TPU lanes.  Candidates:
- NCHW dimension numbers (let spatial dims ride the lanes)
- space-to-depth: run the level at [B, 512, 512, 128] with an equivalent
  4×4 conv (full lanes, ~1.8× FLOPs, but FLOPs are free here)
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def t(fn, *args, tag="", n=10):
    c = jax.jit(fn)
    out = c(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = c(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1000:.2f} ms (batch total)", flush=True)
    return dt


def main():
    B = 4
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (B, 1024, 1024, 32), dt)
    w = jax.random.normal(key, (3, 3, 32, 32), dt) * 0.05

    def conv_nhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    t(conv_nhwc, x, w, tag="conv3x3 NHWC C=32 @1024²")

    xc = jnp.transpose(x, (0, 3, 1, 2))
    wc = jnp.transpose(w, (3, 2, 0, 1))

    def conv_nchw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2, dimension_numbers=("NCHW", "OIHW", "NCHW")
        )

    t(conv_nchw, xc, wc, tag="conv3x3 NCHW C=32 @1024²")

    # space-to-depth equivalent cost: dense 4×4 conv 128→128 @512²
    xs = jax.random.normal(key, (B, 512, 512, 128), dt)
    w44 = jax.random.normal(key, (4, 4, 128, 128), dt) * 0.02

    def conv44(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(2, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    t(conv44, xs, w44, tag="conv4x4 128->128 @512² (s2d-equivalent)")

    # s2d/d2s transform cost
    def s2d(x):
        B, H, W, C = x.shape
        return (
            x.reshape(B, H // 2, 2, W // 2, 2, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, H // 2, W // 2, 4 * C)
        )

    t(s2d, x, tag="space-to-depth 1024²x32 -> 512²x128")

    # how fast is the elementwise floor at this size?
    t(lambda a: a * 1.5 + 0.5, x, tag="elementwise a*1.5+0.5 @1024²x32")

    # bf16 vs f32 conv
    t(conv_nhwc, x.astype(jnp.float32), w.astype(jnp.float32),
      tag="conv3x3 NHWC C=32 @1024² f32")


if __name__ == "__main__":
    main()
