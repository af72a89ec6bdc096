"""Rasterizer micro-benchmark: Pallas tile kernel vs XLA chunked scan, real TPU."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from audio2photoreal_tpu.ops.pallas_raster import rasterize_pallas
from audio2photoreal_tpu.render.rasterizer import rasterize

def bench(name, fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

def main(H=1024, W=704, F=7000, V=4000):
    rng = np.random.RandomState(0)
    pix = jnp.asarray(rng.rand(1, V, 2).astype(np.float32) * [W, H])
    depth = jnp.asarray(rng.rand(1, V).astype(np.float32) * 4 + 0.5)
    faces = jnp.asarray(rng.randint(0, V, (F, 3)).astype(np.int32))
    pal = jax.jit(lambda p, d: rasterize_pallas(p, d, faces, H, W, tile=(128, 128), chunk=16))
    bench(f"pallas {H}x{W} F={F}", pal, pix, depth)
    xla = jax.jit(lambda p, d: rasterize(p, d, faces, H, W, chunk=256))
    bench(f"xla    {H}x{W} F={F}", xla, pix, depth)

if __name__ == "__main__":
    main()
