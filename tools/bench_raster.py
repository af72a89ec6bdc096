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

def grid_mesh(nx, ny, H, W, rng):
    """Realistic small-triangle mesh: a jittered grid covering ~half the frame
    (body meshes have face extents of a few pixels, the case the chunk-level
    bbox cull + Morton ordering targets)."""
    xs = np.linspace(W * 0.25, W * 0.75, nx)
    ys = np.linspace(H * 0.05, H * 0.95, ny)
    gx, gy = np.meshgrid(xs, ys)
    verts = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.float32)
    verts += rng.randn(*verts.shape).astype(np.float32) * 1.5
    faces = []
    for j in range(ny - 1):
        for i in range(nx - 1):
            a = j * nx + i
            faces.append([a, a + 1, a + nx])
            faces.append([a + 1, a + nx + 1, a + nx])
    depth = (rng.rand(len(verts)).astype(np.float32) * 2 + 1.0)
    return verts[None], depth[None], np.asarray(faces, np.int32)


def main(H=1024, W=704):
    rng = np.random.RandomState(0)
    # realistic mesh (≈7k small faces)
    v, d, f = grid_mesh(60, 60, H, W, rng)
    pix, depth, faces = jnp.asarray(v), jnp.asarray(d), jnp.asarray(f)
    F = faces.shape[0]
    pal = jax.jit(lambda p, d: rasterize_pallas(p, d, faces, H, W, tile=(128, 128), chunk=16))
    bench(f"pallas mesh   {H}x{W} F={F}", pal, pix, depth)
    xla = jax.jit(lambda p, d: rasterize(p, d, faces, H, W, chunk=256, use_pallas=False))
    bench(f"xla    mesh   {H}x{W} F={F}", xla, pix, depth)

    # adversarial: random full-screen triangles (no culling possible)
    V = 4000
    pix2 = jnp.asarray(rng.rand(1, V, 2).astype(np.float32) * [W, H])
    depth2 = jnp.asarray(rng.rand(1, V).astype(np.float32) * 4 + 0.5)
    faces2 = jnp.asarray(rng.randint(0, V, (7000, 3)).astype(np.int32))
    pal2 = jax.jit(lambda p, d: rasterize_pallas(p, d, faces2, H, W, tile=(128, 128), chunk=16))
    bench(f"pallas random {H}x{W} F=7000", pal2, pix2, depth2)


if __name__ == "__main__":
    main()
