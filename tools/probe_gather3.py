"""Follow-up gather probe: per-frame take under lax.scan vs batched
take_along_axis — the practical formulations for the renderer's texture
sampling.  See probe_gather2 findings: shared-table take runs ~160M idx/s
vs ~45M for batched take_along_axis."""

import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    def chained(*a):
        def body(c, _):
            idx = a[-1] ^ c
            out = fn(*a[:-1], idx)
            return c ^ out.sum().astype(jnp.int32), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return acc

    c = jax.jit(chained)
    _ = int(c(*args))
    t0 = time.perf_counter()
    _ = int(c(*args))
    return (time.perf_counter() - t0) / iters


def main():
    B = 16
    H, W = 1024, 704
    P = H * W
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.linspace(0.2, 0.8, H), np.linspace(0.2, 0.8, W), indexing="ij")
    uv = np.stack([xx, yy], -1)[None].repeat(B, 0)
    uv += rng.randn(*uv.shape) * 1e-3

    for S in (2048, 1024):
        idx = (
            np.clip(uv[..., 1] * S, 0, S - 1).astype(np.int64) * S
            + np.clip(uv[..., 0] * S, 0, S - 1).astype(np.int64)
        ).reshape(B, P)
        idx_j = jnp.asarray(idx, jnp.int32)
        for slice_w, tag in ((4, "quad4"), (1, "single1")):
            tab = jnp.asarray(rng.randint(0, 2**20, (B, S * S, slice_w)), jnp.int32)

            # (a) scan over frames: per-frame plain take
            def scan_take(t, i):
                def body(_, ti):
                    tb, ib = ti
                    return 0, jnp.take(tb, ib, axis=0)

                _, out = jax.lax.scan(body, 0, (t, i))
                return out

            dt = timeit(scan_take, tab, idx_j)
            print(
                f"S={S} {tag} scan-per-frame take: {dt*1e3/B:.2f} ms/frame "
                f"({B*P/dt/1e6:.0f}M idx/s)",
                flush=True,
            )

            # (b) one take from [B*S*S, w] with frame offsets folded in
            off = (jnp.arange(B, dtype=jnp.int32) * (S * S))[:, None]
            dt = timeit(
                lambda t, i: jnp.take(t.reshape(B * S * S, slice_w), (i + off).reshape(-1), axis=0),
                tab, idx_j,
            )
            print(
                f"S={S} {tag} flat take: {dt*1e3/B:.2f} ms/frame "
                f"({B*P/dt/1e6:.0f}M idx/s)",
                flush=True,
            )

            # (c) baseline batched take_along_axis
            dt = timeit(
                lambda t, i: jnp.take_along_axis(t, i[..., None], axis=1), tab, idx_j
            )
            print(
                f"S={S} {tag} batched t_a_a: {dt*1e3/B:.2f} ms/frame "
                f"({B*P/dt/1e6:.0f}M idx/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
