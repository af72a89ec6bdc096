"""Why is the up3 3x3 s2d conv 10x above roofline? (round 4)

probe_up3_split: conv3x3 s2d g2 @[16,512,512,128] = 2.09 ms/frame = 9% MFU
and ~10x the HBM roofline.  Variants to isolate the poison:
  a) grouped (fgc=2) conv         -- product today
  b) dense conv, block-diag kernel (same values, no fgc)
  c) 9-shifted-matmul formulation (dot_general on [B*H*W, C])
  d) lhs-dilated fused 2x-up+conv (fixed from probe_up3_split)
  e) s2d2 convs (fixed)
  f) conv as jnp.einsum patch contraction
"""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.layers import (
    _s2d2_conv3x3_kernel,
    _s2d_conv3x3_kernel,
    depth_to_space,
    resize_bilinear_s2d,
    space_to_depth,
)

B, K = 16, 6
dt = jnp.bfloat16
rng = np.random.RandomState(0)
x_in = jnp.asarray(rng.randn(B, 256, 256, 128).astype(np.float32) * 0.1, dt)
x_up = jnp.asarray(rng.randn(B, 512, 512, 128).astype(np.float32) * 0.1, dt)
w1 = jnp.asarray(rng.randn(3, 3, 16, 16).astype(np.float32) * 0.05, dt)
w1s = _s2d_conv3x3_kernel(w1)  # [3,3,64,64] per group


def chain(name, body, *args):
    def run(*a):
        def step(c, i):
            return jnp.float32(body(i, *a)), None

        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))[0]

    c = jax.jit(run)
    try:
        float(c(*args))
        pert = tuple((x + jnp.asarray(0.25, x.dtype)) for x in args)
        t0 = time.time()
        float(c(*pert))
        print(f"{name}: {(time.time() - t0) / K / B * 1000:.2f} ms/frame", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


def s(i, x):
    return x + i.astype(dt) * jnp.asarray(1e-4, dt)


# a) grouped conv (product path)
chain("a) grouped fgc=2", lambda i, x: jnp.sum(jax.lax.conv_general_dilated(
    s(i, x), jnp.concatenate([w1s, w1s], -1), (1, 1), [(1, 1)] * 2,
    dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
)[:, ::64, ::64].astype(jnp.float32)), x_up)

# b) dense block-diagonal kernel [3,3,128,128]
wbd = jnp.concatenate(
    [jnp.concatenate([w1s, jnp.zeros_like(w1s)], 2),
     jnp.concatenate([jnp.zeros_like(w1s), w1s], 2)], -1)
chain("b) dense block-diag 128->128", lambda i, x: jnp.sum(jax.lax.conv_general_dilated(
    s(i, x), wbd, (1, 1), [(1, 1)] * 2,
    dimension_numbers=("NHWC", "HWIO", "NHWC"),
)[:, ::64, ::64].astype(jnp.float32)), x_up)


# c) 9 shifted matmuls: out[y,x] = sum_dy,dx X[y+dy,x+dx] @ W[dy,dx]
def shifted_mm(i, x):
    xx = s(i, x)
    Bq, H, W, C = xx.shape
    xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((Bq, H, W, 128), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            out = out + jnp.einsum(
                "bhwc,cd->bhwd", xp[:, dy:dy + H, dx:dx + W, :], wbd[dy, dx],
                preferred_element_type=jnp.float32,
            )
    return jnp.sum(out[:, ::64, ::64])


chain("c) 9 shifted matmuls dense", shifted_mm)

# d) fused 2x-up + conv as lhs-dilated 6x6 (dense 32ch)
wbig = jnp.asarray(rng.randn(6, 6, 32, 32).astype(np.float32) * 0.02, dt)


def convT_fused(i, x):
    xd = depth_to_space(s(i, x))  # [B,512,512,32]
    out = jax.lax.conv_general_dilated(
        xd, wbig, (1, 1), [(3, 3)] * 2, lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.sum(out[:, ::64, ::64].astype(jnp.float32))


chain("d) lhs-dilated 6x6 up+conv dense", convT_fused, x_in)

# e) conv in s2d2 coords
w1s2 = _s2d2_conv3x3_kernel(w1)
wbd2 = jnp.concatenate(
    [jnp.concatenate([w1s2, jnp.zeros_like(w1s2)], 2),
     jnp.concatenate([jnp.zeros_like(w1s2), w1s2], 2)], -1)


def conv_s2d2(i, x):
    s2 = space_to_depth(s(i, x))  # [B,256,256,512]
    out = jax.lax.conv_general_dilated(
        s2, wbd2, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.sum(depth_to_space(out)[:, ::64, ::64].astype(jnp.float32))


chain("e) dense s2d2 512ch (incl relayout)", conv_s2d2, x_up)


# f) batch-of-rows matmul: reshape to [B*H, W, C] unchanged - try NCHW layout
chain("f) grouped fgc=2 NCHW", lambda i, x: jnp.sum(jax.lax.conv_general_dilated(
    jnp.transpose(s(i, x), (0, 3, 1, 2)), jnp.transpose(jnp.concatenate([w1s, w1s], -1), (3, 2, 0, 1)),
    (1, 1), [(1, 1)] * 2,
    dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=2,
)[:, ::64, ::16, ::16].astype(jnp.float32)), x_up)
