"""Isolate seam primitive costs: scatter-only and gather-only, several
layouts, at [16, 1024, 1024, 32] bf16 with 48k destinations."""

import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.ops.gridsample import take_per_frame


def timeit(fn, mk, iters=3, tag="", donate=True):
    c = jax.jit(fn, donate_argnums=0 if donate else ())
    try:
        out = c(mk(-1))
        jax.block_until_ready(out)
        del out
        args = [mk(i) for i in range(iters)]
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        outs = [c(a) for a in args]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        del outs, args
        print(f"{tag:44s} {dt*1e3:8.2f} ms/call {dt*1e3/16:7.3f} ms/frame", flush=True)
        return dt
    except Exception as e:
        print(f"{tag:44s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


def main():
    B, S, C = 16, 1024, 32
    HW = S * S
    M = 48_000
    rng = np.random.RandomState(0)
    dst = jnp.asarray(np.sort(rng.choice(HW, M, replace=False)).astype(np.int32))
    vals = jnp.asarray(rng.randn(B, M, C).astype(np.float32)).astype(jnp.bfloat16)
    vals_cf = jnp.asarray(np.ascontiguousarray(np.transpose(np.asarray(vals), (0, 2, 1))))
    base = jnp.asarray(rng.randn(B, S, S, C).astype(np.float32)).astype(jnp.bfloat16)
    mk = lambda i: base + jnp.bfloat16(0.01 * (i + 2))

    # pure copy baseline
    timeit(lambda x: x * jnp.bfloat16(1.0001), mk, tag="dense elementwise (1 copy)")

    def scat_flat(x):
        flat = x.reshape(B, HW, C)
        return flat.at[:, dst].set(vals).reshape(B, S, S, C)

    timeit(scat_flat, mk, tag="scatter [B,HW,C] .at[:,dst]")

    def scat_cf(x):
        arr = x.transpose(0, 3, 1, 2).reshape(B, C, HW)
        arr = arr.at[:, :, dst].set(vals_cf)
        return arr.reshape(B, C, S, S).transpose(0, 2, 3, 1)

    timeit(scat_cf, mk, tag="scatter channels-first minor")

    def scat_cf_noT(x):
        # pretend x already channels-first: isolate the scatter itself
        arr = x.reshape(B, C, HW)  # wrong semantics, right shapes
        return arr.at[:, :, dst].set(vals_cf).reshape(B, S, S, C)

    timeit(scat_cf_noT, mk, tag="scatter cf (no transposes)")

    def scat_1d(x):
        # fully collapsed scatter: 1D operand, expanded indices
        idx1 = (jnp.arange(B)[:, None] * HW * C)
        flat_idx = (dst[None, :, None] * C + jnp.arange(C)[None, None, :] + idx1[..., None])
        return x.reshape(-1).at[flat_idx.reshape(-1)].set(vals.reshape(-1)).reshape(B, S, S, C)

    timeit(scat_1d, mk, tag="scatter 1D collapsed")

    # gathers
    def gath_rows(x):
        flat = x.reshape(B, HW, C)
        idx = jnp.broadcast_to(dst[None], (B, M))
        return take_per_frame(flat, idx)  # [B, M, C]

    timeit(gath_rows, mk, tag="gather rows take_per_frame (1 tap)")

    def gath_rows5(x):
        flat = x.reshape(B, HW, C)
        acc = jnp.zeros((B, M, C), jnp.float32)
        for k in range(5):
            idx = jnp.broadcast_to(((dst + k * 37) % HW)[None], (B, M))
            acc = acc + take_per_frame(flat, idx).astype(jnp.float32)
        return acc

    timeit(gath_rows5, mk, tag="gather rows x5 taps")


if __name__ == "__main__":
    main()
