"""Probe: quad-texture gather variants at product scale (720k px, 2048² quad).
quad rides as a jit ARGUMENT (a closure constant would 413 the compile
tunnel)."""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

K = 16


def t(op, g0, quad, tag=""):
    @jax.jit
    def run(g, q):
        def body(c, _):
            return op(c, q), None

        y, _ = jax.lax.scan(body, g, None, length=K)
        return jnp.sum(y.astype(jnp.float32))

    float(run(g0, quad))
    t0 = time.perf_counter()
    float(run(g0, quad))
    total = time.perf_counter() - t0
    print(f"{tag}: {(total - 0.028) / K * 1000:.2f} ms/op", flush=True)


def main():
    B = 8
    quad = (jax.random.normal(jax.random.PRNGKey(7), (B, 2048, 2048, 4)) * 100).astype(jnp.int32)
    grid0 = jax.random.uniform(jax.random.PRNGKey(8), (B, 1024, 704, 2), minval=-1, maxval=1)

    from audio2photoreal_tpu.ops.gridsample import grid_sample_bilinear_quad

    def current(g, q):
        out = grid_sample_bilinear_quad(q, g)
        return jnp.clip(g + out[..., :2] * 1e-9, -1, 1)

    t(current, grid0, quad, tag="take_along_axis per-batch (current)")

    def flatbatch(g, q):
        Bq, H, W, _ = q.shape
        x = ((g[..., 0] + 1.0) * W - 1.0) * 0.5
        y = ((g[..., 1] + 1.0) * H - 1.0) * 0.5
        xi = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
        boff = (jnp.arange(Bq, dtype=jnp.int32) * (H * W))[:, None, None]
        idx = (boff + yi * W + xi).reshape(-1)
        qv = jnp.take(q.reshape(Bq * H * W, 4), idx, axis=0)
        qv = qv.reshape(g.shape[:-1] + (4,))
        return jnp.clip(g + qv[..., :2].astype(g.dtype) * 1e-9, -1, 1)

    t(flatbatch, grid0, quad, tag="flat-batch single take")

    # int64-packed pairs: gather 2×int64? TPU lacks i64 vector — skip.
    # sorted-gather: sort indices for locality, gather, unsort
    def sorted_gather(g, q):
        Bq, H, W, _ = q.shape
        x = ((g[..., 0] + 1.0) * W - 1.0) * 0.5
        y = ((g[..., 1] + 1.0) * H - 1.0) * 0.5
        xi = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
        boff = (jnp.arange(Bq, dtype=jnp.int32) * (H * W))[:, None, None]
        idx = (boff + yi * W + xi).reshape(-1)
        order = jnp.argsort(idx)
        qv = jnp.take(q.reshape(Bq * H * W, 4), idx[order], axis=0)
        inv = jnp.argsort(order)
        qv = jnp.take(qv, inv, axis=0).reshape(g.shape[:-1] + (4,))
        return jnp.clip(g + qv[..., :2].astype(g.dtype) * 1e-9, -1, 1)

    t(sorted_gather, grid0, quad, tag="sorted gather (argsort+unsort)")


if __name__ == "__main__":
    main()
