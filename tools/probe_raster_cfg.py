"""Sweep pallas rasterizer tile/chunk configs at the render operating point
(B=16, 1024x704, ~7k-face body-like mesh), scan-chained honest timing."""

import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.ops.pallas_raster import rasterize_pallas
from tools.bench_raster import grid_mesh


def timeit(fn, *args, iters=10):
    def chained(*a):
        def body(c, _):
            out = fn(a[0] + c, *a[1:])
            return c + 0.0 * out[2].ravel()[0] + 0.0, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    c = jax.jit(chained)
    _ = float(c(*args))
    t0 = time.perf_counter()
    _ = float(c(*args))
    return (time.perf_counter() - t0) / iters


def main(H=1024, W=704, B=16):
    rng = np.random.RandomState(0)
    v, d, f = grid_mesh(60, 60, H, W, rng)
    pix = jnp.asarray(np.tile(v, (B, 1, 1)) + rng.randn(B, v.shape[1], 2) * 0.5)
    dep = jnp.asarray(np.tile(d, (B, 1)))
    faces = jnp.asarray(f)
    for tile in ((128, 128), (64, 128), (128, 256), (256, 128), (64, 256)):
        for chunk in (8, 16, 32):
            try:
                fn = lambda p, dd: rasterize_pallas(
                    p, dd, faces, H, W, tile=tile, chunk=chunk
                )
                dt = timeit(fn, pix, dep)
                print(f"tile={tile} chunk={chunk}: {dt*1e3/B:.2f} ms/frame", flush=True)
            except Exception as e:
                print(f"tile={tile} chunk={chunk}: FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
