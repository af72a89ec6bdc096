"""Micro-probe: which op inside ConvDecoder eats the 19 ms/frame?

Times the raw constituent ops at production shapes (B=4, 1024² UV, 2-group
feature pyramid) directly, bypassing flax — isolates conv vs upsample vs
seam-scatter vs untied-bias costs on the real chip.
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


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

    # 1024²-level feature map, 32 channels (16 per group)
    x1k = jax.random.normal(key, (B, 1024, 1024, 32), dt)
    x512 = jax.random.normal(key, (B, 512, 512, 32), dt)
    w33 = jax.random.normal(key, (3, 3, 32, 32), dt) * 0.05
    w11 = jax.random.normal(key, (1, 1, 32, 32), dt) * 0.05

    def conv(x, w, pad):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    t(lambda x: conv(x, w33, 1), x1k, tag="conv3x3 32->32 @1024²")
    t(lambda x: conv(x, w11, 0), x1k, tag="conv1x1 32->32 @1024²")

    from audio2photoreal_tpu.render.layers import resize_bilinear

    t(lambda x: resize_bilinear(x, (1024, 1024), align_corners=True), x512,
      tag="bilinear up 512->1024 (align_corners)")

    # untied bias add
    ub = jax.random.normal(key, (1024, 1024, 32), jnp.float32)
    t(lambda x: x + ub[None].astype(x.dtype), x1k, tag="untied bias add @1024²")

    # seam ops on features (ConvDecoder :614-617 does impaint + 2× resample)
    from audio2photoreal_tpu.render.assets import empty_seam_sampler
    from audio2photoreal_tpu.render.seams import SeamSampler

    M = 40_000  # realistic seam table size
    rng = np.random.RandomState(0)
    seam = SeamSampler(
        impaint_dst=jnp.asarray(rng.randint(0, 1024 * 1024, M), jnp.int32),
        impaint_src=jnp.asarray(rng.randint(0, 1024 * 1024, M), jnp.int32),
        resample_uvs=jnp.asarray(rng.rand(M, 2).astype(np.float32) * 2 - 1),
        resample_dst=jnp.asarray(rng.randint(0, 1024 * 1024, M), jnp.int32),
        resample_weights=jnp.asarray(rng.rand(M).astype(np.float32)),
        uv_size=1024,
    )
    t(lambda x: seam.impaint(x), x1k, tag=f"seam impaint M={M} @1024²x32ch")
    t(lambda x: seam.resample(x), x1k, tag=f"seam resample M={M} @1024²x32ch")

    # full UpConvBlockDeep equivalents at each pyramid level
    from audio2photoreal_tpu.render.blocks import UpConvBlockDeep

    for size, cin in ((128, 128), (256, 64), (512, 32), (1024, 32)):
        blk = UpConvBlockDeep(cin if size < 1024 else 32, size, groups=2)
        xs = jax.random.normal(key, (B, size // 2, size // 2, cin), dt)
        p = blk.init(jax.random.PRNGKey(1), xs)

        def run(p, xs, blk=blk):
            from audio2photoreal_tpu.render.layers import render_compute_dtype

            with render_compute_dtype(jnp.bfloat16):
                return blk.apply(p, xs)

        t(run, p, xs, tag=f"UpConvBlockDeep @{size}² cin={cin}")


if __name__ == "__main__":
    main()
