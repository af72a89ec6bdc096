"""Probe 5: amortized per-op timings — K chained iterations inside one jit
(lax.scan, output feeds input so nothing can be elided), one fetch at the
end.  per-op ms = (total − RTT) / K with RTT measured by a K=0 control."""

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
    """op: x -> x (same shape/dtype)."""

    def body(c, _):
        return op(c, *extra), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(y.astype(jnp.float32))

    s = float(run(x0))  # warmup
    t0 = time.perf_counter()
    s = float(run(x0))
    total = time.perf_counter() - t0

    @jax.jit
    def rtt_fn(x):
        return jnp.sum(x.astype(jnp.float32))

    float(rtt_fn(x0))
    t0 = time.perf_counter()
    float(rtt_fn(x0))
    rtt = time.perf_counter() - t0
    per = (total - rtt) / K * 1000
    print(f"{tag}: {per:.2f} ms/op (total {total*1000:.0f}, rtt {rtt*1000:.0f})",
          flush=True)
    return per


def main():
    B = 4
    dt = jnp.bfloat16
    x1k = jax.random.normal(jax.random.PRNGKey(1), (B, 1024, 1024, 32), dt)
    w33 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 32, 32), dt) * 0.05
    w33g = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16, 32), dt) * 0.05

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    t(conv, x1k, tag="conv3x3 dense 32->32 @1024²", extra=(w33,))

    def convg(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
        )

    t(convg, x1k, tag="conv3x3 grouped fg=2 @1024²", extra=(w33g,))

    # s2d layout: same tensor as [B, 512, 512, 128]
    xs2d = jax.random.normal(jax.random.PRNGKey(4), (B, 512, 512, 128), dt)
    w44 = jax.random.normal(jax.random.PRNGKey(5), (4, 4, 128, 128), dt) * 0.02

    def conv44(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 2), (1, 2)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    t(conv44, xs2d, tag="conv4x4 128->128 @512² (s2d equivalent)", extra=(w44,))

    # elementwise / copy floors
    t(lambda x: x * 1.0000001 + 0.0001, x1k, tag="elementwise @1024²x32")

    # resize take-based (512→1024, align_corners) — NOT same-shape; chain via
    # downsample-by-slicing to keep the scan closed
    x512 = jax.random.normal(jax.random.PRNGKey(6), (B, 512, 512, 32), dt)
    from audio2photoreal_tpu.render.layers import resize_bilinear

    t(lambda x: resize_bilinear(x, (1024, 1024), align_corners=True)[:, ::2, ::2],
      x512, tag="resize up+slice-down @512²↔1024²")

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
        y = jnp.einsum("ow,bhwc->bhoc", R, y)
        return y[:, ::2, ::2]

    t(resize_mm, x512, tag="mm-resize up+slice-down @512²↔1024²", extra=(R,))

    # full UpConvBlockDeep chained (1024² out → slice back to 512² in)
    from audio2photoreal_tpu.render.blocks import UpConvBlockDeep
    from audio2photoreal_tpu.render.layers import render_compute_dtype

    blk = UpConvBlockDeep(32, 1024, groups=2)
    p = blk.init(jax.random.PRNGKey(7), x512)

    def blk_op(x, p):
        with render_compute_dtype(jnp.bfloat16):
            return blk.apply(p, x)[:, ::2, ::2]

    t(blk_op, x512, tag="UpConvBlockDeep @1024² (chained)", extra=(p,))

    # texture quad gather chained: gather 720k px from 2048² quad
    from audio2photoreal_tpu.ops.gridsample import grid_sample_bilinear_quad

    quad = jax.random.randint(jax.random.PRNGKey(8), (B, 2048, 2048, 4), 0, 2**24, jnp.int32)
    grid0 = jax.random.uniform(jax.random.PRNGKey(9), (B, 1024, 704, 2), minval=-1, maxval=1)

    def gather_op(g, quad):
        out = grid_sample_bilinear_quad(quad, g)  # [B, 1024, 704, 3]
        # fold the result back into the grid so the scan stays closed
        return jnp.clip(g + out[..., :2] * 1e-9, -1, 1)

    t(gather_op, grid0, tag="quad texture gather 720k px @2048²", extra=(quad,))


if __name__ == "__main__":
    main()
