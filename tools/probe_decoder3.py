"""Honest ConvDecoder stage split at the production point (B=16, bf16).

Fresh-args + scalar-fetch + scan-chain discipline (NOTES_ROUND3)."""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.blocks import UpConvBlockDeep
from audio2photoreal_tpu.render.layers import render_compute_dtype
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

B, K = 16, 6
cfg = RendererConfig(
    uv_size=1024, init_uv_size=64, upscale_size=2048, n_embs=256,
    n_face_embs=256, shadow_size=256, encoder_in_size=512,
    face_tex_size=1024, n_face_verts=512, image_height=1024, image_width=704,
)
assets = make_synthetic_assets(cfg, mesh_density=10)
model = BodyAvatar(cfg, assets)

rng = np.random.RandomState(0)
motion = jnp.asarray(rng.randn(B, 104).astype(np.float32) * 0.1)
campos = jnp.asarray(np.tile([0.0, -3.0, 1.0], (B, 1)).astype(np.float32))
K_mat = jnp.asarray(np.tile([[500.0, 0, 352], [0, 500.0, 512], [0, 0, 1]], (B, 1, 1)).astype(np.float32))
Rt = jnp.asarray(np.tile([[1, 0, 0, 0], [0, 0, -1, 1], [0, 1, 0, 3]], (B, 1, 1)).astype(np.float32))
embs = jnp.zeros((B, cfg.n_embs))
face_embs = jnp.zeros((B, cfg.n_face_embs))

params = jax.jit(
    lambda r: model.init(
        {"params": r}, motion, campos, embs=embs, face_embs_body=face_embs,
        encode=False, render=True, K=K_mat, Rt=Rt,
    )
)(jax.random.PRNGKey(0))


def chain(name, body, *args):
    def run(*a):
        def step(c, i):
            return jnp.float32(body(i, *a)), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))[0]

    c = jax.jit(run)
    float(c(*args))
    pert = tuple(
        (x + jnp.asarray(0.25, x.dtype)) if jnp.issubdtype(x.dtype, jnp.floating) else x
        for x in args
    )
    t0 = time.time()
    float(c(*pert))
    print(f"{name}: {(time.time() - t0) / K / B * 1000:.2f} ms/frame", flush=True)


dt = jnp.bfloat16
x64 = jnp.asarray(rng.randn(B, 64, 64, 256).astype(np.float32) * 0.1, dt)
x1k32 = jnp.asarray(rng.randn(B, 1024, 1024, 32).astype(np.float32) * 0.1, dt)

dec_params = {"params": params["params"]["decoder"]}


def full_dec(i, m):
    with render_compute_dtype(dt):
        out = model.apply(
            params, m + i * 1e-4, embs, face_embs,
            method=lambda mo, mm, e, f: mo.decoder(mm, e, f),
        )
        return jnp.sum(out["tex_mean_rec"][:, ::128, ::128].astype(jnp.float32))


def pyramid(i, x):
    # the 4 up blocks exactly as the decoder runs them (2 groups)
    with render_compute_dtype(dt):
        h = x + i.astype(dt) * jnp.asarray(1e-4, dt)
        n_blocks = 4
        sizes = [64 * 2**s for s in range(n_blocks + 1)]
        n_channels = [max(128 // 2**b, 16) for b in range(n_blocks + 1)]
        for b in range(n_blocks):
            blk = UpConvBlockDeep(n_channels[b + 1] * 2, sizes[b + 1], groups=2, name=f"up{b}")
            h = blk.apply(
                {"params": dec_params["params"][f"up{b}"]}, h
            )
        return jnp.sum(h[:, ::128, ::128].astype(jnp.float32))


def one_level(b):
    sizes = [64 * 2**s for s in range(5)]
    n_channels = [max(128 // 2**bb, 16) for bb in range(5)]
    cin = n_channels[b] * 2
    size_in = sizes[b]
    xs = jnp.asarray(
        rng.randn(B, size_in, size_in, cin).astype(np.float32) * 0.1, dt
    )

    def body(i, x):
        with render_compute_dtype(dt):
            blk = UpConvBlockDeep(n_channels[b + 1] * 2, sizes[b + 1], groups=2, name=f"up{b}")
            h = blk.apply({"params": dec_params["params"][f"up{b}"]}, x + i.astype(dt) * jnp.asarray(1e-4, dt))
            return jnp.sum(h[:, ::64, ::64].astype(jnp.float32))

    chain(f"up{b} ({sizes[b]}->{sizes[b+1]}, cin={cin})", body, xs)


def seam_body(i, x):
    with render_compute_dtype(dt):
        h = assets.seam.fused_apply(x + i.astype(dt) * jnp.asarray(1e-4, dt), n_resample=2)
        return jnp.sum(h[:, ::128, ::128].astype(jnp.float32))


def final_conv(i, x):
    from audio2photoreal_tpu.render.layers import conv3x3_s2d, depth_to_space, space_to_depth

    with render_compute_dtype(dt):
        x = x + i.astype(dt) * jnp.asarray(1e-4, dt)
        vparams = dec_params["params"]["verts_conv"]
        tparams = dec_params["params"]["tex_conv"]
        from audio2photoreal_tpu.render.layers import Conv2dWNUB

        vw, vb = Conv2dWNUB(3, 1024, 1024, 3, 1, 1).apply({"params": vparams}, x[..., :16], weights_only=True)
        tw, tb = Conv2dWNUB(3, 1024, 1024, 3, 1, 1).apply({"params": tparams}, x[..., 16:], weights_only=True)
        wj = jnp.concatenate(
            [jnp.concatenate([vw, jnp.zeros_like(vw)], axis=2),
             jnp.concatenate([jnp.zeros_like(tw), tw], axis=2)], axis=-1)
        bj = jnp.concatenate([vb, tb], axis=-1)[None].astype(wj.dtype)
        out = conv3x3_s2d(space_to_depth(x.astype(wj.dtype)), wj)
        out = depth_to_space(out + space_to_depth(bj))
        return jnp.sum(out[:, ::128, ::128].astype(jnp.float32))


def from_uv_body(i, x):
    with render_compute_dtype(dt):
        v = assets.geo.from_uv((x + i.astype(dt) * jnp.asarray(1e-4, dt))[..., :3])
        return jnp.sum(v[:, ::64].astype(jnp.float32))


chain("conv_decoder FULL", full_dec, motion)
chain("up pyramid (4 blocks)", pyramid, x64)
for b in range(4):
    one_level(b)
chain("seam fused_apply @1024²x32", seam_body, x1k32)
chain("final fused conv 32->6 s2d", final_conv, x1k32)
chain("from_uv", from_uv_body, x1k32)
