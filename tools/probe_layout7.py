"""Probe 7: isolate strided-slice cost, 2× upsample variants, flat gather."""

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
    x1k = jax.random.normal(jax.random.PRNGKey(1), (B, 1024, 1024, 32), dt)

    # strided slice + restore via concat (restore ~2 copies of 134MB)
    def slice_restore(x):
        y = x[:, ::2, ::2] * 1.0000001
        y2 = jnp.concatenate([y, y], axis=1)
        return jnp.concatenate([y2, y2], axis=2)

    t(slice_restore, x1k, tag="::2 slice + concat restore @1024²")

    # avgpool via contiguous reshape+mean, then 2x upsample (half-pixel,
    # gather-free) — round trip at constant shape
    from audio2photoreal_tpu.render.layers import _upsample2x_half_pixel

    def pool_up(x):
        B_, H, W, C = x.shape
        y = x.reshape(B_, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
        return _upsample2x_half_pixel(y)

    t(pool_up, x1k, tag="avgpool2 + upsample2x(half-pixel) @1024²")

    # align_corners matmul-resize WITHOUT any slice: 512→1024 then avgpool
    x512 = jax.random.normal(jax.random.PRNGKey(2), (B, 512, 512, 32), dt)

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

    def resize_mm_pool(x, R):
        B_, H, W, C = x.shape
        y = jnp.einsum("oh,bhx->box", R, x.reshape(B_, H, W * C)).reshape(B_, 2 * H, W, C)
        yt = y.transpose(0, 1, 3, 2)
        z = jnp.einsum("ow,bhcw->bhco", R, yt).transpose(0, 1, 3, 2)
        return z.reshape(B_, H, 2, W, 2, C).mean(axis=(2, 4))

    t(resize_mm_pool, x512, tag="mm-resize(ac=True) + avgpool @512²↔1024²", extra=(R,))

    # take-based resize (current impl) + avgpool (no strided slice)
    from audio2photoreal_tpu.render.layers import resize_bilinear

    def resize_take_pool(x):
        y = resize_bilinear(x, (1024, 1024), align_corners=True)
        B_, H, W, C = x.shape
        return y.reshape(B_, H, 2, W, 2, C).mean(axis=(2, 4))

    t(resize_take_pool, x512, tag="take-resize(ac=True) + avgpool @512²↔1024²")

    # flat-batch quad gather: one [N] gather from [B·HW, 4]
    quad = (jax.random.normal(jax.random.PRNGKey(7), (B, 2048, 2048, 4)) * 100).astype(jnp.int32)
    grid0 = jax.random.uniform(jax.random.PRNGKey(8), (B, 1024, 704, 2), minval=-1, maxval=1)

    def gather_flatbatch(g, quad):
        Bq, H, W, _ = quad.shape
        x = (g[..., 0] + 1.0) * W * 0.5
        y = (g[..., 1] + 1.0) * H * 0.5
        xi = jnp.clip(x.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(y.astype(jnp.int32), 0, H - 1)
        boff = (jnp.arange(Bq) * H * W)[:, None, None]
        idx = (boff + yi * W + xi).reshape(-1)
        q = jnp.take(quad.reshape(Bq * H * W, 4), idx, axis=0)
        q = q.reshape(g.shape[:-1] + (4,))
        return jnp.clip(g + q[..., :2].astype(g.dtype) * 1e-9, -1, 1)

    t(gather_flatbatch, grid0, tag="flat-batch quad gather 720k px", extra=(quad,))

    from audio2photoreal_tpu.ops.gridsample import grid_sample_bilinear_quad

    def gather_op(g, quad):
        out = grid_sample_bilinear_quad(quad, g)
        return jnp.clip(g + out[..., :2] * 1e-9, -1, 1)

    t(gather_op, grid0, tag="current quad gather (take_along_axis)", extra=(quad,))


if __name__ == "__main__":
    main()
