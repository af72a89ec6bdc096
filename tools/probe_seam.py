"""Isolated TPU micro-bench of seam-pipeline formulations at production
operating points.  Reports ms/call, ms/frame, and compiled peak HBM."""

import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.ops.gridsample import take_per_frame
from audio2photoreal_tpu.render.assets import synthetic_seam_sampler


def timeit(fn, mk, iters=3, tag=""):
    c = jax.jit(fn, donate_argnums=0)
    try:
        lowered = c.lower(mk(-1))
        compiled = lowered.compile()
        try:
            mem = compiled.memory_analysis()
            peak = getattr(mem, "temp_size_in_bytes", 0) + getattr(mem, "argument_size_in_bytes", 0)
        except Exception:
            peak = -1
        out = c(mk(-1))
        jax.block_until_ready(out)
        del out
        args = [mk(i) for i in range(iters)]
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        outs = [c(a) for a in args]  # donated inputs free as they execute
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        del outs, args
        B = mk(0).shape[0]
        print(f"{tag:34s} {dt*1e3:8.2f} ms/call {dt*1e3/B:7.3f} ms/frame  temp {peak/2**30:6.2f} GiB", flush=True)
        return dt
    except Exception as e:
        print(f"{tag:34s} FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None


def variants(seam, n_resample, C):
    HW = seam.uv_size * seam.uv_size
    packed = seam._fused.get(n_resample) or seam._compose(n_resample)
    seam._fused[n_resample] = packed
    dst_np, taps_np, ws_np = packed

    def v_sequential(tex):
        return seam.resample(seam.resample(seam.impaint(tex))) if n_resample == 2 else seam.resample(seam.impaint(tex))

    def v_planar(tex):  # current implementation
        return seam.fused_apply(tex, n_resample)

    def v_rowform(tex):
        dst, taps, ws = jnp.asarray(dst_np), jnp.asarray(taps_np), jnp.asarray(ws_np)
        B, H, W, C_ = tex.shape
        M, K = taps.shape
        flat = tex.reshape(B, H * W, C_)
        out = jnp.zeros((B, M, C_), jnp.float32)
        for k in range(K):
            idx = jnp.broadcast_to(taps[:, k][None], (B, M))
            g = take_per_frame(flat, idx).astype(jnp.float32)
            out = out + g * ws[None, :, k, None]
        flat = flat.at[:, dst].set(out.astype(tex.dtype))
        return flat.reshape(B, H, W, C_)

    # bucketed taps: rows sorted by tap count, processed in pow2 buckets
    counts = (ws_np != 0).sum(1)
    order = np.argsort(counts, kind="stable")
    dst_s, taps_s, ws_s, counts_s = dst_np[order], taps_np[order], ws_np[order], counts[order]
    buckets = []
    start = 0
    for kb in (1, 2, 4, 8, 16, 32):
        end = int(np.searchsorted(counts_s, kb, side="right"))
        if end > start:
            buckets.append((start, end, int(kb)))
            start = end
        if start >= len(dst_s):
            break

    def v_bucketed(tex):
        B, H, W, C_ = tex.shape
        flat = tex.reshape(B, H * W, C_)
        outs, dsts = [], []
        for s, e, kb in buckets:
            taps_b = jnp.asarray(taps_s[s:e, :kb])
            ws_b = jnp.asarray(ws_s[s:e, :kb])
            Mb = e - s
            acc = jnp.zeros((B, Mb, C_), jnp.float32)
            for k in range(kb):
                idx = jnp.broadcast_to(taps_b[:, k][None], (B, Mb))
                g = take_per_frame(flat, idx).astype(jnp.float32)
                acc = acc + g * ws_b[None, :, k, None]
            outs.append(acc)
            dsts.append(dst_s[s:e])
        out = jnp.concatenate(outs, axis=1)
        dst_all = jnp.asarray(np.concatenate(dsts))
        flat = flat.at[:, dst_all].set(out.astype(tex.dtype))
        return flat.reshape(B, H, W, C_)

    def v_bucketed_planar_scatter(tex):
        B, H, W, C_ = tex.shape
        flat = tex.reshape(B, H * W, C_)
        outs, dsts = [], []
        for s, e, kb in buckets:
            taps_b = jnp.asarray(taps_s[s:e, :kb])
            ws_b = jnp.asarray(ws_s[s:e, :kb])
            Mb = e - s
            acc = jnp.zeros((B, Mb, C_), jnp.float32)
            for k in range(kb):
                idx = jnp.broadcast_to(taps_b[:, k][None], (B, Mb))
                g = take_per_frame(flat, idx).astype(jnp.float32)
                acc = acc + g * ws_b[None, :, k, None]
            outs.append(acc)
            dsts.append(dst_s[s:e])
        out = jnp.concatenate(outs, axis=1).astype(tex.dtype)  # [B, M, C]
        dst_all = jnp.asarray(np.concatenate(dsts))
        # channels-first scatter along minor axis
        arr = tex.transpose(0, 3, 1, 2).reshape(B, C_, H * W)
        arr = arr.at[:, :, dst_all].set(out.transpose(0, 2, 1))
        return arr.reshape(B, C_, H, W).transpose(0, 2, 3, 1)

    return [
        ("sequential", v_sequential),
        ("planar-cf (current)", v_planar),
        ("rowform flat", v_rowform),
        ("bucketed rowform", v_bucketed),
        ("bucketed + planar scatter", v_bucketed_planar_scatter),
    ]


def main():
    rng = np.random.RandomState(0)
    B = 16
    for uv, C, n, n_res, tag in (
        (1024, 32, 24000, 2, "conv_decoder 1024x32"),
        (2048, 3, 48000, 2, "forward_tex 2048x3"),
    ):
        print(f"== {tag} ==", flush=True)
        seam = synthetic_seam_sampler(uv, n, np.random.RandomState(1))
        base = jnp.asarray(rng.randn(B, uv, uv, C).astype(np.float32)).astype(jnp.bfloat16)
        mk = lambda i: base + jnp.bfloat16(0.01 * (i + 2))
        for name, fn in variants(seam, n_res, C):
            timeit(fn, mk, tag=name)


if __name__ == "__main__":
    main()
