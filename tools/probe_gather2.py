"""Pin down the TPU texture-gather cost model: index count vs bytes vs
table size.  Drives jnp.take_along_axis with realistic UV-derived indices
(spatially coherent, like the rasterizer output) over varying table sizes
and slice widths.  Timing: chain K iterations inside one jit via lax.scan
and fetch a scalar (per the probe methodology in COVERAGE.md)."""

import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    # thread the carry into the INDEX argument (last positional) so the
    # gather is not loop-invariant — XLA hoists invariant ops out of scans
    def chained(*a):
        def body(c, _):
            idx = a[-1] ^ c  # c is 0 at runtime; defeats LICM
            out = fn(*a[:-1], idx)
            return c ^ out.sum().astype(jnp.int32), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return acc

    c = jax.jit(chained)
    _ = int(c(*args))  # compile + warm
    t0 = time.perf_counter()
    _ = int(c(*args))  # fetching the scalar forces execution on the tunnel
    return (time.perf_counter() - t0) / iters


def main():
    B = 16
    H, W = 1024, 704
    P = H * W
    rng = np.random.RandomState(0)
    # spatially coherent indices: a smooth UV field like the raster output
    yy, xx = np.meshgrid(np.linspace(0.2, 0.8, H), np.linspace(0.2, 0.8, W), indexing="ij")
    uv = np.stack([xx, yy], -1)[None].repeat(B, 0)  # [B,H,W,2]
    uv += rng.randn(*uv.shape) * 1e-3

    for S in (2048, 1024, 512):
        idx = (
            np.clip(uv[..., 1] * S, 0, S - 1).astype(np.int64) * S
            + np.clip(uv[..., 0] * S, 0, S - 1).astype(np.int64)
        ).reshape(B, P)
        idx_j = jnp.asarray(idx, jnp.int32)
        for slice_w, dtype, tag in (
            (4, jnp.int32, "quad4xi32"),
            (2, jnp.int32, "pair2xi32"),
            (1, jnp.int32, "single_i32"),
            (8, jnp.int32, "oct8xi32"),
        ):
            tab = jnp.asarray(
                rng.randint(0, 2**20, (B, S * S, slice_w)), dtype
            )
            fn = lambda t, i: jnp.take_along_axis(t, i[..., None], axis=1)
            dt = timeit(fn, tab, idx_j)
            gb = B * P * slice_w * 4 / dt / 1e9
            print(
                f"S={S} {tag}: {dt*1e3/B:.2f} ms/frame  "
                f"({B*P/dt/1e6:.0f}M idx/s, {gb:.1f} GB/s)",
                flush=True,
            )

    # shared (non-batched) table: all frames gather from ONE [S*S, 4] table
    for S in (2048, 1024):
        idx = (
            np.clip(uv[..., 1] * S, 0, S - 1).astype(np.int64) * S
            + np.clip(uv[..., 0] * S, 0, S - 1).astype(np.int64)
        ).reshape(B * P)
        idx_j = jnp.asarray(idx, jnp.int32)
        tab = jnp.asarray(rng.randint(0, 2**20, (S * S, 4)), jnp.int32)
        fn = lambda t, i: jnp.take(t, i, axis=0)
        dt = timeit(fn, tab, idx_j)
        print(
            f"S={S} shared quad4xi32: {dt*1e3/B:.2f} ms/frame "
            f"({B*P/dt/1e6:.0f}M idx/s)",
            flush=True,
        )

    # random (incoherent) indices as the worst case, S=2048 quad
    S = 2048
    idx_r = jnp.asarray(rng.randint(0, S * S, (B, P)), jnp.int32)
    tab = jnp.asarray(rng.randint(0, 2**20, (B, S * S, 4)), jnp.int32)
    fn = lambda t, i: jnp.take_along_axis(t, i[..., None], axis=1)
    dt = timeit(fn, tab, idx_r)
    print(f"S={S} quad4xi32 RANDOM idx: {dt*1e3/B:.2f} ms/frame", flush=True)

    # sorted-by-index gather (ideal coherence): does locality matter at all?
    idx_s = jnp.sort(idx_r, axis=1)
    dt = timeit(fn, tab, idx_s)
    print(f"S={S} quad4xi32 SORTED idx: {dt*1e3/B:.2f} ms/frame", flush=True)


if False and __name__ == "__main__":
    main()


def main2():
    B = 16
    H, W = 1024, 704
    P = H * W
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.linspace(0.2, 0.8, H), np.linspace(0.2, 0.8, W), indexing="ij")
    uv = np.stack([xx, yy], -1)[None].repeat(B, 0)
    uv += rng.randn(*uv.shape) * 1e-3
    S = 2048
    idx = (
        np.clip(uv[..., 1] * S, 0, S - 1).astype(np.int64) * S
        + np.clip(uv[..., 0] * S, 0, S - 1).astype(np.int64)
    )
    # flattened: per-frame tables concatenated, indices offset by b*S*S
    off = (np.arange(B) * S * S).reshape(B, 1, 1)
    idx_flat = jnp.asarray((idx + off).reshape(-1), jnp.int32)
    for slice_w, tag in ((4, "quad4xi32"), (2, "pair2xi32"), (1, "single_i32")):
        tab = jnp.asarray(rng.randint(0, 2**20, (B * S * S, slice_w)), jnp.int32)
        fn = lambda t, i: jnp.take(t, i, axis=0)
        dt = timeit(fn, tab, idx_flat)
        print(
            f"FLAT B*S*S {tag}: {dt*1e3/B:.2f} ms/frame ({B*P/dt/1e6:.0f}M idx/s)",
            flush=True,
        )
    # flattened 1-D table (slice width folded into the index): quad as 4
    # consecutive int32 at base 4*idx — contiguous 16B but via 1-D take
    tab1 = jnp.asarray(rng.randint(0, 2**20, (B * S * S * 4,)), jnp.int32)
    idx4 = idx_flat * 4
    fn4 = lambda t, i: (
        jnp.take(t, i) + jnp.take(t, i + 1) + jnp.take(t, i + 2) + jnp.take(t, i + 3)
    )
    dt = timeit(fn4, tab1, idx4)
    print(f"FLAT 1-D 4x take: {dt*1e3/B:.2f} ms/frame", flush=True)
    # reshaped [N, 4] again but via dynamic_slice-free take with 2-D idx
    tabr = tab1.reshape(-1, 4)
    dt = timeit(lambda t, i: jnp.take(t, i, axis=0), tabr, idx_flat)
    print(f"FLAT reshaped [N,4] take: {dt*1e3/B:.2f} ms/frame", flush=True)


main2()
