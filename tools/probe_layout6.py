"""Probe 6: NCHW convs + minor-dim-optimized matmul resize, honest scan
timing."""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

K = 32


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
    per = (total - 0.028) / K * 1000
    print(f"{tag}: {per:.2f} ms/op", flush=True)
    return per


def main():
    B = 4
    dt = jnp.bfloat16
    xc = jax.random.normal(jax.random.PRNGKey(1), (B, 32, 1024, 1024), dt)
    wc = jax.random.normal(jax.random.PRNGKey(2), (32, 32, 3, 3), dt) * 0.05

    def conv_nchw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2, dimension_numbers=("NCHW", "OIHW", "NCHW")
        )

    t(conv_nchw, xc, tag="conv3x3 dense 32->32 @1024² NCHW", extra=(wc,))

    # optimized mm-resize: row matmul with W·C minor, col matmul via
    # transposed layout, final transpose back
    x512 = jax.random.normal(jax.random.PRNGKey(3), (B, 512, 512, 32), dt)

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

    def resize_mm_opt(x, R):
        B_, H, W, C = x.shape
        Ho = R.shape[0]
        # rows: [Ho,H] × [B,H,W*C] — minor dim W*C is big
        y = jnp.einsum("oh,bhx->box", R, x.reshape(B_, H, W * C))
        y = y.reshape(B_, Ho, W, C)
        # cols: transpose W to minor, matmul, transpose back
        yt = y.transpose(0, 1, 3, 2)  # [B, Ho, C, W]
        z = jnp.einsum("ow,bhcw->bhco", R, yt)  # [B, Ho, C, Wo]
        out = z.transpose(0, 1, 3, 2)
        return out[:, ::2, ::2]

    t(resize_mm_opt, x512, tag="mm-resize OPT up+slice @512²↔1024²", extra=(R,))

    # pure transpose cost at 1024²
    x1k = jax.random.normal(jax.random.PRNGKey(4), (B, 1024, 1024, 32), dt)
    t(lambda x: x.transpose(0, 1, 3, 2).transpose(0, 1, 3, 2) * 1.0000001, x1k,
      tag="double transpose @1024²x32")

    # s2d conv with the grouped structure (2 groups of 64 in s2d space)
    xs2d = jax.random.normal(jax.random.PRNGKey(5), (B, 512, 512, 128), dt)
    w44g = jax.random.normal(jax.random.PRNGKey(6), (4, 4, 64, 128), dt) * 0.02

    def conv44g(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 2), (1, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
        )

    t(conv44g, xs2d, tag="conv4x4 fg=2 128ch @512² (s2d grouped)", extra=(w44g,))

    # quad gather at REAL pixel count, small jit (previous HTTP 413 was the
    # giant random-int quad constant — generate inside)
    from audio2photoreal_tpu.ops.gridsample import grid_sample_bilinear_quad

    quad = (jax.random.normal(jax.random.PRNGKey(7), (B, 2048, 2048, 4)) * 100).astype(jnp.int32)
    grid0 = jax.random.uniform(jax.random.PRNGKey(8), (B, 1024, 704, 2), minval=-1, maxval=1)

    def gather_op(g, quad):
        out = grid_sample_bilinear_quad(quad, g)
        return jnp.clip(g + out[..., :2] * 1e-9, -1, 1)

    t(gather_op, grid0, tag="quad texture gather 720k px @2048²", extra=(quad,))


if __name__ == "__main__":
    main()
