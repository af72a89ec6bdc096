"""Binned-worklist vs dense-sweep raster timing on the real chip.

Scan-chains K invocations inside one jit and fetches a scalar (the device
tunnel defers/coalesces small dispatches — per-call timing lies)."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from audio2photoreal_tpu.ops.pallas_raster import rasterize_pallas
from tools.bench_raster import grid_mesh

import os
H, W, K, B = 1024, 704, 10, 4
NX = int(os.environ.get('NX', '80'))
TILE = tuple(int(x) for x in os.environ.get('TILE', '32,128').split(','))


def chain(binned):
    rng = np.random.RandomState(0)
    v, d, f = grid_mesh(NX, NX, H, W, rng)
    v = np.tile(v, (B, 1, 1)); d = np.tile(d, (B, 1))
    pix, depth, faces = jnp.asarray(v), jnp.asarray(d), jnp.asarray(f)

    def step(carry, _):
        face, _, dep, uv = rasterize_pallas(
            pix, depth + carry * 1e-6, faces, H, W, tile=TILE, chunk=64,
            face_uv=jnp.zeros((faces.shape[0], 3, 2)), remap_ids=False,
            binned=binned,
        )
        return jnp.float32(jnp.sum(dep[0, ::64, ::64])), None

    f_ = jax.jit(lambda: jax.lax.scan(step, jnp.float32(0.0), None, length=K)[0])
    out = f_(); jax.block_until_ready(out)
    t0 = time.time(); out = f_(); jax.block_until_ready(out)
    dt = (time.time() - t0) / K / B * 1000
    print(f"binned={binned}: {dt:.2f} ms/frame (B={B}, F={faces.shape[0]})", flush=True)


for b in (True, False):
    chain(b)
