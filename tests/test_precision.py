"""Mixed precision + remat configuration smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.core.config import DenoiserConfig, DiffusionConfig, TrainConfig
from audio2photoreal_tpu.diffusion.schedules import make_schedule
from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.train.loops import make_diffusion_train_step
from audio2photoreal_tpu.train.state import create_train_state


def _setup(dtype="bfloat16", remat=False):
    cfg = DenoiserConfig(
        data_format="pose", nfeats=8, latent_dim=16, ff_size=32,
        num_layers=2, num_heads=2, max_seq_length=12, keyframe_step=6,
        dtype=dtype, remat=remat,
    )
    model = FiLMDenoiser(cfg)
    B, T = 2, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 8))
    t = jnp.zeros((B,), jnp.int32)
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T * 1600, 2)) * 0.1
    kf = jax.random.normal(jax.random.PRNGKey(2), (B, 2, 104))
    kv = jnp.ones((B, 2))
    params = model.init(
        {"params": jax.random.PRNGKey(3), "cond_drop": jax.random.PRNGKey(4)},
        x, t, audio, kf, kv,
    )
    return model, params, dict(motion=x, mask=jnp.ones((B, T)), audio=audio,
                               keyframes=kf, keyframe_valid=kv)


def test_bf16_compute_keeps_f32_params():
    model, params, batch = _setup("bfloat16")
    # params stay float32 (TPU policy: bf16 compute, f32 master params)
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
    out = model.apply(params, batch["motion"], jnp.zeros((2,), jnp.int32),
                      batch["audio"], batch["keyframes"], batch["keyframe_valid"])
    assert bool(jnp.all(jnp.isfinite(out)))


def test_bf16_train_step_finite():
    model, params, batch = _setup("bfloat16")
    sched = make_schedule("cosine", 100)
    state = create_train_state(params, TrainConfig(lr=1e-4))
    step = jax.jit(make_diffusion_train_step(model, sched, DiffusionConfig()))
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_remat_matches_no_remat():
    m1, p1, batch = _setup("float32", remat=False)
    m2 = FiLMDenoiser(m1.cfg.__class__(**{**m1.cfg.__dict__, "remat": True}))
    out1 = m1.apply(p1, batch["motion"], jnp.zeros((2,), jnp.int32),
                    batch["audio"], batch["keyframes"], batch["keyframe_valid"])
    out2 = m2.apply(p1, batch["motion"], jnp.zeros((2,), jnp.int32),
                    batch["audio"], batch["keyframes"], batch["keyframe_valid"])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    # gradients flow through the remat path
    def loss(p):
        o = m2.apply(p, batch["motion"], jnp.zeros((2,), jnp.int32),
                     batch["audio"], batch["keyframes"], batch["keyframe_valid"])
        return (o**2).mean()

    g = jax.grad(loss)(p1)
    assert np.isfinite(float(jax.tree_util.tree_leaves(g)[0].sum()))


def test_nonfinite_grad_skips_update():
    """NaN batch → update skipped, params unchanged (fp16_util backoff role)."""
    model, params, batch = _setup("float32")
    sched = make_schedule("cosine", 100)
    state = create_train_state(params, TrainConfig(lr=1e-2))
    step = jax.jit(make_diffusion_train_step(model, sched, DiffusionConfig()))
    bad = dict(batch)
    bad["motion"] = batch["motion"].at[0, 0, 0].set(jnp.nan)
    new_state, m = step(state, bad, jax.random.PRNGKey(0))
    assert float(m["skipped_nonfinite"]) == 1.0
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(new_state.params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    assert int(new_state.step) == int(state.step)
    # and a good batch still updates
    ok_state, m2 = step(state, batch, jax.random.PRNGKey(1))
    assert float(m2["skipped_nonfinite"]) == 0.0
    assert int(ok_state.step) == int(state.step) + 1


def test_step_folds_rng_with_counter():
    """The jitted step derives its rng via fold_in(rng, state.step) so
    trainers can pass ONE base key for the whole run (an eager per-step
    split in the host loop serializes through the device tunnel).  Same
    base key at different step counters must give different draws."""
    model, params, batch = _setup("float32")
    sched = make_schedule("cosine", 100)
    state0 = create_train_state(params, TrainConfig(lr=1e-4))
    step = jax.jit(make_diffusion_train_step(model, sched, DiffusionConfig()))
    key = jax.random.PRNGKey(7)
    # identical state+key → identical result (determinism)
    _, ma = step(state0, batch, key)
    _, mb = step(state0, batch, key)
    assert float(ma["loss"]) == float(mb["loss"])
    # same key, bumped step counter → different t/noise draws
    state1 = state0.replace(step=state0.step + 1)
    _, mc = step(state1, batch, key)
    assert float(mc["loss"]) != float(ma["loss"])


def test_step_accepts_rbg_keys():
    """TrainConfig.rng_impl="rbg" routes dropout through the XLA
    RngBitGenerator; the step must accept typed rbg keys."""
    from audio2photoreal_tpu.core import rng as rng_util

    model, params, batch = _setup("float32")
    sched = make_schedule("cosine", 100)
    state = create_train_state(params, TrainConfig(lr=1e-4))
    step = jax.jit(make_diffusion_train_step(model, sched, DiffusionConfig()))
    state, m = step(state, batch, rng_util.key(0, "rbg"))
    assert np.isfinite(float(m["loss"]))


def test_loss_second_moment_sampler_step():
    """--schedule_sampler loss_second_moment (reference resample.py:138-168):
    the step threads a LossSecondMomentState, counts fill toward the history
    depth, and sampling stays uniform until every timestep is warm."""
    from audio2photoreal_tpu.diffusion import tsample

    model, params, batch = _setup("float32")
    sched = make_schedule("cosine", 10)
    state = create_train_state(params, TrainConfig(lr=1e-4))
    step = jax.jit(
        make_diffusion_train_step(
            model, sched, DiffusionConfig(), schedule_sampler="loss_second_moment"
        )
    )
    ts = tsample.LossSecondMomentState.init(10, history_per_term=2)
    for i in range(4):
        state, m, ts = step(state, batch, jax.random.PRNGKey(i), ts)
        assert np.isfinite(float(m["loss"]))
    # 8 draws recorded, each bin clamped at the ring-buffer depth (H=2)
    assert 0 < int(ts.counts.sum()) <= 8
    assert int(ts.counts.max()) <= 2
    # weights stay uniform before warmup, valid distribution afterward
    w = tsample.loss_second_moment_weights(ts)
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-5)


def test_hash_dropout_mask_semantics():
    """hash_drop_mult: correct keep rate, inverse scaling, determinism,
    distinct masks per site/key (models/blocks.py)."""
    from audio2photoreal_tpu.models.blocks import HashDropout, hash_drop_mult

    key = jax.random.PRNGKey(7)
    shape = (64, 257)
    rate = 0.3
    m = np.asarray(hash_drop_mult(key, shape, rate, jnp.float32))
    vals = np.unique(m.round(6))
    assert set(vals).issubset({0.0, np.float32(1.0 / 0.7).round(6)})
    keep_frac = (m > 0).mean()
    assert abs(keep_frac - 0.7) < 0.02
    # deterministic given the key; different key -> different mask
    m2 = np.asarray(hash_drop_mult(key, shape, rate, jnp.float32))
    np.testing.assert_array_equal(m, m2)
    m3 = np.asarray(hash_drop_mult(jax.random.PRNGKey(8), shape, rate, jnp.float32))
    assert (m3 != m).any()

    # module: two call sites under one scope get distinct path-folded masks
    import flax.linen as nn

    class TwoDrops(nn.Module):
        @nn.compact
        def __call__(self, x):
            a = HashDropout(0.5)(x, deterministic=False)
            b = HashDropout(0.5)(x, deterministic=False)
            return a, b

    x = jnp.ones((8, 64))
    a, b = TwoDrops().apply({}, x, rngs={"dropout": jax.random.PRNGKey(0)})
    assert (np.asarray(a) != np.asarray(b)).any()
    # gradient is masked identically to the forward
    g = jax.grad(lambda xx: jnp.sum(HashDropout(0.5).apply(
        {}, xx, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})))(x)
    y = HashDropout(0.5).apply({}, x, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(g), np.asarray(y), rtol=1e-6)


def test_hash_dropout_train_step():
    """A full denoiser train step with hash_dropout=True stays finite and
    changes params; deterministic eval output is unaffected by the flag."""
    cfg = DenoiserConfig(
        data_format="pose", nfeats=8, latent_dim=16, ff_size=32,
        num_layers=2, num_heads=2, max_seq_length=12, keyframe_step=6,
        hash_dropout=True,
    )
    model = FiLMDenoiser(cfg)
    B, T = 2, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 8))
    t = jnp.zeros((B,), jnp.int32)
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T * 1600, 2)) * 0.1
    kf = jax.random.normal(jax.random.PRNGKey(2), (B, 2, 104))
    kv = jnp.ones((B, 2))
    params = model.init(
        {"params": jax.random.PRNGKey(3), "cond_drop": jax.random.PRNGKey(4)},
        x, t, audio, kf, kv,
    )
    batch = dict(motion=x, mask=jnp.ones((B, T)), audio=audio,
                 keyframes=kf, keyframe_valid=kv)
    state = create_train_state(params, TrainConfig(lr=1e-3))
    step = jax.jit(make_diffusion_train_step(model, make_schedule("cosine", 50),
                                             DiffusionConfig(steps=50)))
    state2, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))
    leaves0 = jax.tree_util.tree_leaves(state.params)
    leaves2 = jax.tree_util.tree_leaves(state2.params)
    assert any((np.asarray(a) != np.asarray(b)).any() for a, b in zip(leaves0, leaves2))

    # eval path (deterministic): flag must not change the function
    cfg_off = DenoiserConfig(
        data_format="pose", nfeats=8, latent_dim=16, ff_size=32,
        num_layers=2, num_heads=2, max_seq_length=12, keyframe_step=6,
        hash_dropout=False,
    )
    cond = model.apply(params, audio, kf, kv, method=FiLMDenoiser.encode_conditioning)
    out_on = model.apply(params, x, t, cond, jnp.ones((B,), bool),
                         method=FiLMDenoiser.denoise)
    out_off = FiLMDenoiser(cfg_off).apply(params, x, t, cond, jnp.ones((B,), bool),
                                          method=FiLMDenoiser.denoise)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off), atol=0)


@pytest.mark.slow
def test_hash_dropout_convergence_ab():
    """Training-dynamics A/B (VERDICT r4 weak #2): hash-position masks and
    nn.Dropout's RNG draws are the same Bernoulli law, so two runs that
    differ ONLY in mask source must produce overlapping loss curves.  Same
    init, same data, same timestep/noise streams (the step folds one base
    key by state.step); final-window means must agree to a fraction of the
    total loss drop."""
    import sys

    sys.path.insert(0, "/root/repo/tools") if "/root/repo/tools" not in sys.path else None
    from probe_hash_dropout_ab import make_batches, run

    n_steps = 120
    batches = make_batches(n_batches=4, B=8)
    rng_losses, _ = run(batches, False, n_steps, latent=32, ff=64, layers=2)
    hash_losses, _ = run(batches, True, n_steps, latent=32, ff=64, layers=2)
    assert np.isfinite(rng_losses).all() and np.isfinite(hash_losses).all()
    w = n_steps // 4
    a, b = rng_losses[-w:].mean(), hash_losses[-w:].mean()
    start = rng_losses[:10].mean()
    drop = start - min(a, b)
    assert drop > 0.05 * start, f"fixture did not learn (drop={drop:.4f})"
    assert abs(a - b) < 0.25 * drop, (
        f"mask-source gap {abs(a - b):.4f} exceeds 25% of the loss drop "
        f"{drop:.4f} (rng {a:.4f} vs hash {b:.4f})"
    )
