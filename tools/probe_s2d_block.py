"""Probe: s2d UpConvBlockDeep vs baseline at both top pyramid levels."""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

K = 24


def t(op, x0, tag="", extra=()):
    def body(c, _):
        return op(c, *extra), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(y.astype(jnp.float32))

    float(run(x0))
    t0 = time.perf_counter()
    float(run(x0))
    total = time.perf_counter() - t0
    print(f"{tag}: {(total - 0.028) / K * 1000:.2f} ms/op", flush=True)


def main():
    B = 8
    dt = jnp.bfloat16
    from audio2photoreal_tpu.render.blocks import UpConvBlockDeep
    from audio2photoreal_tpu.render.layers import render_compute_dtype

    for size, cin, cout in ((1024, 32, 32), (512, 32, 32), (256, 64, 32)):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, size // 2, size // 2, cin), dt)
        blk = UpConvBlockDeep(cout, size, groups=2)
        p = blk.init(jax.random.PRNGKey(2), x)
        print(f"  (s2d={blk._use_s2d(cin)})", flush=True)

        def op(xx, p, blk=blk, size=size):
            with render_compute_dtype(jnp.bfloat16):
                y = blk.apply(p, xx)
            # chain back down with a contiguous-reshape avgpool (no strided slice)
            B_, H, W, C = y.shape
            y = y.reshape(B_, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
            if C != xx.shape[-1]:
                y = jnp.concatenate([y, y], -1)[..., : xx.shape[-1]]
            return y

        t(op, x, tag=f"UpConvBlockDeep @{size}² cin={cin}", extra=(p,))

    # embs pyramid head (4→64) + joint conv @64²: should be tiny
    from audio2photoreal_tpu.render.blocks import ConvBlock

    xj = jax.random.normal(jax.random.PRNGKey(3), (B, 64, 64, 72), dt)
    cb = ConvBlock(128, 64)
    pj = cb.init(jax.random.PRNGKey(4), xj)

    def opj(xx, p):
        with render_compute_dtype(jnp.bfloat16):
            y = cb.apply(p, xx)
        return jnp.concatenate([y, y], -1)[..., :72] * 0.5

    t(opj, xj, tag="joint ConvBlock @64² 72→128", extra=(pj,))


if __name__ == "__main__":
    main()
