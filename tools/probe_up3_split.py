"""up3 internals: which op eats the 6.9 ms/frame? (round 4)

probe_decoder3 @B=16: up3 (512->1024, cin=32, groups=2, s2d path) is 6.90 of
conv_decoder's 12.6 ms/frame, ~6x above a pessimistic all-materialized HBM
roofline (~1.1 ms).  Split the block into its four ops at the exact product
shapes and try variants for the dominant one.

Shapes (s2d-1 coords): in [B,256,256,128] (dense 512^2x32), resize ->
[B,512,512,128] (dense 1024^2x32), kernels [3,3,4*16,4*16] per group x2.
"""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.layers import (
    _interp_matrix,
    _s2d_conv3x3_kernel,
    conv3x3_s2d,
    depth_to_space,
    resize_bilinear,
    resize_bilinear_s2d,
    space_to_depth,
)

B, K = 16, 6
dt = jnp.bfloat16
rng = np.random.RandomState(0)
# product tensors: s2d layout of dense 512^2 x 32 input / 1024^2 x 32 output
x_in = jnp.asarray(rng.randn(B, 256, 256, 128).astype(np.float32) * 0.1, dt)
x_up = jnp.asarray(rng.randn(B, 512, 512, 128).astype(np.float32) * 0.1, dt)
w1 = jnp.asarray(rng.randn(3, 3, 16, 16).astype(np.float32) * 0.05, dt)  # per group
w2 = jnp.asarray(rng.randn(3, 3, 16, 16).astype(np.float32) * 0.05, dt)
wskip = jnp.asarray(rng.randn(1, 1, 16, 16).astype(np.float32) * 0.05, dt)


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


def grouped_s2d_kernel(w, groups=2):
    """[3,3,cpg,cpg]-per-group -> s2d block kernel [3,3,4*cpg*g? ] matching
    conv feature_group_count=groups in s2d coords."""
    return _s2d_conv3x3_kernel(w)  # [3,3,64,64] per group


w1s = grouped_s2d_kernel(w1)
w2s = grouped_s2d_kernel(w2)


def conv_g2_s2d(x, ws):
    # x [B,H,W,128] = 2 groups of 64 s2d channels
    return jax.lax.conv_general_dilated(
        x, jnp.concatenate([ws, ws], -1), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
    )


# ---- stage splits ----
chain("resize_s2d 256->512 (s2d of 2x up)", lambda i, x: jnp.sum(
    resize_bilinear_s2d(x + i.astype(dt) * jnp.asarray(1e-4, dt), (1024, 1024), align_corners=True)[:, ::64, ::64]
    .astype(jnp.float32)), x_in)

chain("conv1 3x3 s2d g2 @512^2x128", lambda i, x: jnp.sum(
    conv_g2_s2d(x + i.astype(dt) * jnp.asarray(1e-4, dt), w1s)[:, ::64, ::64].astype(jnp.float32)), x_up)

chain("conv1+lrelu+conv2+add @512^2x128", lambda i, x: (
    lambda h: jnp.sum((conv_g2_s2d(jax.nn.leaky_relu(conv_g2_s2d(h, w1s), 0.2), w2s) + h)[:, ::64, ::64]
              .astype(jnp.float32))
)(x + i.astype(dt) * jnp.asarray(1e-4, dt)), x_up)

# dense comparison: resize dense + relayout
chain("resize dense 512->1024 x32 (from d2s input)", lambda i, x: jnp.sum(
    resize_bilinear(depth_to_space(x + i.astype(dt) * jnp.asarray(1e-4, dt)), (1024, 1024), align_corners=True)[:, ::64, ::64]
    .astype(jnp.float32)), x_in)

# variant: 2x up via lhs_dilation conv_transpose fused with conv1 (dense)
# bilinear align_corners=True 2x: out = conv(lhs_dilated(x), bilinear taps)
# composed with the 3x3 conv -> single conv with 2-dilated input and a
# derived kernel; here just measure the raw dilated conv cost at shape
wbig = jnp.asarray(rng.randn(6, 6, 16, 16).astype(np.float32) * 0.02, dt)


def convT_fused(i, x):
    xd = depth_to_space(x + i.astype(dt) * jnp.asarray(1e-4, dt))  # [B,512,512,32]
    out = jax.lax.conv_general_dilated(
        xd, jnp.concatenate([wbig, wbig], -1), (1, 1), [(3, 3)] * 2,
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2,
    )
    return jnp.sum(out[:, ::64, ::64].astype(jnp.float32))


chain("fused 2x-up+conv as lhs-dilated 6x6 g2 (dense)", convT_fused)

# variant: whole up3 in s2d2 coords (relayout at edges)
from audio2photoreal_tpu.render.layers import _s2d2_conv3x3_kernel

w1s2 = _s2d2_conv3x3_kernel(w1)
w2s2 = _s2d2_conv3x3_kernel(w2)


def up3_s2d2(i, x):
    h = x + i.astype(dt) * jnp.asarray(1e-4, dt)
    hd = resize_bilinear_s2d(h, (1024, 1024), align_corners=True)
    s2 = space_to_depth(hd)  # s2d2 [B,256,256,512]
    c1 = jax.lax.conv_general_dilated(
        s2, jnp.concatenate([w1s2, w1s2], -1), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
    )
    c2 = jax.lax.conv_general_dilated(
        jax.nn.leaky_relu(c1, 0.2), jnp.concatenate([w2s2, w2s2], -1), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
    )
    out = depth_to_space(c2 + s2)
    return jnp.sum(out[:, ::64, ::64].astype(jnp.float32))


chain("up3 convs in s2d2 (incl relayouts)", up3_s2d2)
