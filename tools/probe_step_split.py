"""Pose train-step decomposition at the BENCH operating point (VERDICT r3
weak #5 / next #6): flash attention, no remat, cached frozen-frontend
features, bf16, bs 64 × T 600.  Where do the ~250 ms beyond the matmuls go?

Stages (each scan-chained K times inside ONE jit, scalar-fetched with fresh
values — probe hygiene per NOTES_ROUND3):
  fwd loss            — loss_fn forward only
  fwd nodrop          — same with deterministic dropout off (RNG cost)
  fwd+bwd             — value_and_grad, grads reduced to a scalar
  optimizer only      — apply_gradients + EMA on frozen grads
  full step           — the production make_diffusion_train_step

Usage: python tools/probe_step_split.py [pose|face] [B]
"""
import sys, time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core import rng as rng_util
from audio2photoreal_tpu.core.config import DenoiserConfig, DiffusionConfig, TrainConfig
from audio2photoreal_tpu.diffusion import gaussian, losses
from audio2photoreal_tpu.diffusion.schedules import make_schedule
from audio2photoreal_tpu.models.audio_encoder import feature_frames
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.train.loops import make_diffusion_train_step
from audio2photoreal_tpu.train.state import create_train_state, update_ema

fam = sys.argv[1] if len(sys.argv) > 1 else "pose"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
T, K = 600, 4
pose = fam == "pose"
nfeats = 104 if pose else 256
hash_drop = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
cfg = DenoiserConfig(
    data_format=fam, nfeats=nfeats, latent_dim=256 if pose else 512,
    ff_size=1024, num_layers=8, num_heads=4, max_seq_length=T,
    dtype="bfloat16", remat=False, flash_attention=True,
    frontend_dtype="bfloat16", hash_dropout=hash_drop,
)
rng = np.random.RandomState(0)
Ta = feature_frames(T * 1600 // 3)
batch = {
    "motion": jnp.asarray(rng.randn(B, T, nfeats).astype(np.float32) * 0.1),
    "mask": jnp.ones((B, T), jnp.float32),
    "audio_features": jnp.asarray(rng.randn(B, Ta, 1024).astype(np.float32) * 0.5),
}
init_args = [batch["motion"], jnp.zeros((B,), jnp.int32),
             jnp.zeros((B, T * 1600, 2), jnp.float32)]
if pose:
    batch["keyframes"] = jnp.asarray(rng.randn(B, T // 30, 104).astype(np.float32))
    batch["keyframe_valid"] = jnp.ones((B, T // 30), jnp.float32)
    init_args += [batch["keyframes"], batch["keyframe_valid"]]
else:
    batch["lip_verts"] = jnp.asarray(rng.randn(B, T, 1014).astype(np.float32) * 0.1)

model = FiLMDenoiser(cfg)
params = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)}, *init_args
)
sched = make_schedule("cosine", 1000)
dcfg = DiffusionConfig()


def make_loss(deterministic: bool):
    def loss_fn(p, b, key):
        k_t, k_noise, k_drop, k_dropout = jax.random.split(key, 4)
        x0 = b["motion"]
        t = jax.random.randint(k_t, (B,), 0, sched.num_timesteps)
        noise = jax.random.normal(k_noise, x0.shape)
        xt = gaussian.q_sample(sched, x0, t, noise)
        out = model.apply(
            p, xt, t, None, b.get("keyframes"), b.get("keyframe_valid"),
            cond_drop_prob=dcfg.cond_drop_prob,
            deterministic=deterministic,
            rngs={"cond_drop": k_drop, "dropout": k_dropout},
            audio_features=b["audio_features"], lip_verts=b.get("lip_verts"),
        )
        terms = losses.training_losses(
            sched, dcfg.predict, out, x0, xt, t, b["mask"][..., None],
            var_type=dcfg.var_type, with_vb=True,
        )
        return terms["loss"].mean()

    return loss_fn


def _pparams(p, eps):
    # fresh VALUES without duplicating the 0.5 GB batch (the no-remat bwd at
    # bs 64 already fills most of HBM): nudge one tiny leaf
    import flax

    flat = flax.traverse_util.flatten_dict(p)
    k = next(kk for kk in flat if flat[kk].size < 4096)
    flat = {**flat, k: flat[k] + eps}
    return flax.traverse_util.unflatten_dict(flat)


def chain(name, body):
    try:
        f = jax.jit(lambda p, b: jax.lax.scan(
            lambda c, i: (body(c, p, b, i), None),
            jnp.float32(0.0), jnp.arange(K))[0])
        float(f(params, batch))
        p2 = _pparams(params, 1e-6)
        t0 = time.time(); float(f(p2, batch))
        print(f"{name}: {(time.time()-t0)/K*1000:.0f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}", flush=True)


loss_d = make_loss(False)
loss_nd = make_loss(True)
key0 = rng_util.key(5, "rbg")

def _pert(b, c):
    # thread the carry through the INPUT — a dead `+ c*0` tail would let XLA
    # overlap the chained iterations and under-report
    return {**b, "motion": b["motion"] + c * 1e-6}


chain("fwd loss (dropout on)", lambda c, p, b, i: loss_d(
    p, _pert(b, c), jax.random.fold_in(key0, i)))
chain("fwd loss (no dropout)", lambda c, p, b, i: loss_nd(
    p, _pert(b, c), jax.random.fold_in(key0, i)))
chain("fwd+bwd (dropout on)", lambda c, p, b, i: sum(
    jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(
        jax.grad(loss_d)(p, _pert(b, c), jax.random.fold_in(key0, i)))) * 1e-9)
chain("fwd+bwd (no dropout)", lambda c, p, b, i: sum(
    jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(
        jax.grad(loss_nd)(p, _pert(b, c), jax.random.fold_in(key0, i)))) * 1e-9)

# optimizer alone: K chained apply_gradients with the params as fake grads
state0 = create_train_state(params, TrainConfig(lr=1e-4))


def opt_chain():
    def f_(s, b):
        def body(s_, i):
            g = jax.tree_util.tree_map(
                lambda p: (p * (1e-8 * (i + 1))).astype(p.dtype), s_.params
            )
            s2 = s_.apply_gradients(g)
            s2 = update_ema(s2, 0.9999) if s2.ema_params is not None else s2
            return s2, None

        return jax.lax.scan(body, s, jnp.arange(K))[0]

    f = jax.jit(f_, donate_argnums=(0,))
    s1 = f(state0, batch)
    jax.block_until_ready(s1.params)
    t0 = time.time()
    s2 = f(s1, batch)
    float(s2.step)
    print(f"optimizer+EMA only: {(time.time()-t0)/K*1000:.0f} ms", flush=True)
    return s2


state_after = opt_chain()

step_fn = make_diffusion_train_step(model, sched, dcfg, 0.0)


def step_chain():
    def f_(s, b):
        def body(s_, i):
            s2, m = step_fn(s_, b, jax.random.fold_in(key0, i))
            return s2, None

        return jax.lax.scan(body, s, jnp.arange(K))[0]

    f = jax.jit(f_, donate_argnums=(0,))
    s1 = f(state_after, batch)
    jax.block_until_ready(s1.params)
    t0 = time.time()
    s2 = f(s1, batch)
    float(s2.step)
    print(f"full train step: {(time.time()-t0)/K*1000:.0f} ms", flush=True)


step_chain()
