"""Probe 2: pin down the UpConvBlockDeep@1024² cost with everything as jit
arguments, and test interpolation-as-matmul for the align_corners upsample."""

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


def upsample_matrix(H: int, Ho: int, align_corners: bool = True) -> np.ndarray:
    """[Ho, H] bilinear interpolation matrix (2 nonzeros per row)."""
    if align_corners:
        pos = np.linspace(0.0, H - 1.0, Ho)
    else:
        pos = (np.arange(Ho) + 0.5) * H / Ho - 0.5
    i0 = np.clip(np.floor(pos).astype(int), 0, H - 1)
    i1 = np.minimum(i0 + 1, H - 1)
    w = np.clip(pos - i0, 0.0, 1.0)
    R = np.zeros((Ho, H), np.float32)
    R[np.arange(Ho), i0] += 1 - w
    R[np.arange(Ho), i1] += w
    return R


def main():
    B = 4
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x512 = jax.random.normal(key, (B, 512, 512, 32), dt)
    x1k = jax.random.normal(key, (B, 1024, 1024, 32), dt)
    ub = jax.random.normal(key, (1024, 1024, 32), jnp.float32)

    t(lambda x, b: x + b[None].astype(x.dtype), x1k, ub, tag="untied bias add (as ARG)")

    from audio2photoreal_tpu.render.layers import resize_bilinear

    t(lambda x: resize_bilinear(x, (1024, 1024), align_corners=True), x512,
      tag="resize take-based (current)")

    R = jnp.asarray(upsample_matrix(512, 1024, True), dt)

    def resize_mm(x, R):
        # rows: [Ho,H]×[B,H,W,C] via einsum; cols likewise
        y = jnp.einsum("oh,bhwc->bowc", R, x)
        return jnp.einsum("ow,bhwc->bhoc", R, y)

    t(resize_mm, x512, R, tag="resize as two matmuls")

    # correctness vs the take-based path
    a = jax.jit(lambda x: resize_bilinear(x.astype(jnp.float32), (1024, 1024), align_corners=True))(x512)
    b = jax.jit(lambda x, R: resize_mm(x.astype(jnp.float32), R.astype(jnp.float32)))(x512, R)
    err = float(jnp.abs(a - b).max())
    print(f"resize matmul max err: {err:.2e}", flush=True)

    # full UpConvBlockDeep with params as args (as the model runs it)
    from audio2photoreal_tpu.render.blocks import UpConvBlockDeep
    from audio2photoreal_tpu.render.layers import render_compute_dtype

    blk = UpConvBlockDeep(32, 1024, groups=2)
    p = blk.init(jax.random.PRNGKey(1), x512)

    def run(p, xs):
        with render_compute_dtype(jnp.bfloat16):
            return blk.apply(p, xs)

    t(run, p, x512, tag="UpConvBlockDeep @1024² (params as args)")

    # hand-rolled equivalent: matmul-resize + 3 convs + untied biases
    w1 = jax.random.normal(key, (3, 3, 16, 32), dt) * 0.05
    w2 = jax.random.normal(key, (3, 3, 16, 32), dt) * 0.05
    wr = jax.random.normal(key, (1, 1, 16, 32), dt) * 0.05
    b1 = jax.random.normal(key, (1024, 1024, 32), jnp.float32)

    def hand(x, R, w1, w2, wr, b1):
        xu = resize_mm(x, R)
        from audio2photoreal_tpu.render.layers import _grouped_conv

        skip = _grouped_conv(xu, wr, 1, 0, 2)
        h = _grouped_conv(xu, w1, 1, 1, 2) + b1[None].astype(xu.dtype)
        h = jax.nn.leaky_relu(h, 0.2)
        h = _grouped_conv(h, w2, 1, 1, 2) + b1[None].astype(xu.dtype)
        h = jax.nn.leaky_relu(h, 0.2)
        return h + skip

    t(hand, x512, R, w1, w2, wr, b1, tag="hand-rolled block (mm resize)")


if __name__ == "__main__":
    main()
