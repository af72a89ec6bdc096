"""forward_tex sub-stage timings at the production point (B=16, 1024²→2048²).

Scan-chains K iterations with perturbed input inside one jit; params/assets
ride as jit args where big (tunnel: closures >~100MB fail remote compile)."""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render.assets import make_synthetic_assets
from audio2photoreal_tpu.render.layers import render_compute_dtype
from audio2photoreal_tpu.render.mesh_vae import BodyAvatar, RendererConfig

B, K = 16, 8
cfg = RendererConfig(
    uv_size=1024, init_uv_size=64, upscale_size=2048, n_embs=256,
    n_face_embs=256, shadow_size=256, encoder_in_size=512,
    face_tex_size=1024, n_face_verts=512, image_height=1024, image_width=704,
)
assets = make_synthetic_assets(cfg, mesh_density=10)
model = BodyAvatar(cfg, assets)

rng = np.random.RandomState(0)
tex_mean = jnp.asarray(rng.randn(B, 1024, 1024, 3).astype(np.float32) * 0.1, jnp.bfloat16)
tex_view = jnp.asarray(rng.randn(B, 1024, 1024, 3).astype(np.float32) * 0.1, jnp.bfloat16)
shadow = jnp.asarray(rng.rand(B, 2048, 2048, 1).astype(np.float32), jnp.bfloat16)

motion0 = np.zeros((1, 104), np.float32)
params = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0)}, jnp.asarray(motion0),
    jnp.zeros((1, 3), jnp.float32), geom=assets.lbs.pose(None, jnp.asarray(motion0)),
    face_embs=jnp.zeros((1, 256), jnp.float32),
)


def chain(name, body):
    f = jax.jit(lambda p, a, b: jax.lax.scan(
        lambda c, _: (body(c, p, a, b), None), jnp.float32(0.0), None, length=K)[0])
    float(f(params, tex_mean, tex_view))  # warmup; FETCH forces execution
    # (the tunnel defers until a fetch and serves repeated identical calls
    # from a result cache) — time with fresh argument values
    t0 = time.time()
    float(f(params, tex_mean + jnp.bfloat16(0.25), tex_view + jnp.bfloat16(0.25)))
    print(f"{name}: {(time.time()-t0)/K/B*1000:.2f} ms/frame", flush=True)


def tap(x):
    return jnp.sum(x.astype(jnp.float32))


from audio2photoreal_tpu.render.layers import resize_bilinear

with render_compute_dtype(jnp.bfloat16):
    chain("seam_1k fused_apply(tex)", lambda c, p, a, b: tap(
        assets.seam.fused_apply(a + b + c.astype(jnp.bfloat16) * 1e-3, n_resample=1)))
    chain("resize 1024->2048", lambda c, p, a, b: tap(
        resize_bilinear(a + c.astype(jnp.bfloat16) * 1e-3, (2048, 2048))))
    chain("upscale_net", lambda c, p, a, b: tap(
        model.apply(p, jnp.concatenate([a, b + c.astype(jnp.bfloat16) * 1e-3], -1),
                    method=lambda m, x: m.upscale_net(x))))
    chain("seam_2k fused_apply(shadow 2k)", lambda c, p, a, b: tap(
        assets.seam_2k.fused_apply(shadow + c.astype(jnp.bfloat16) * 1e-3, n_resample=2)))
    chain("FULL forward_tex", lambda c, p, a, b: tap(
        model.apply(p, a + c.astype(jnp.bfloat16) * 1e-3, b, shadow,
                    method=BodyAvatar.forward_tex, final_seam=False)))

# NOTE (measured): strided-slice taps let XLA narrow stages to the tapped
# pixels (0.00 ms reads), and even full-sum chains can read ~0 on repeat
# calls in some sessions.  Trust only runs whose stage times roughly sum to
# the FULL forward_tex time (e.g. 0.71 + 0.63 + 3.00 + 1.18 ≈ 5.16 FULL).
