"""Golden-value tests for the diffusion math library.

Coefficients and updates are checked against hand-computed numpy references
(the same closed forms as Ho et al. / Nichol-Dhariwal), independent of any
model. These pin the math the reference relies on
(reference: diffusion/gaussian_diffusion.py, diffusion/respace.py).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2photoreal_tpu.diffusion import gaussian, losses, sampling
from audio2photoreal_tpu.diffusion.respace import maybe_respaced, respaced_schedule, space_timesteps
from audio2photoreal_tpu.diffusion.schedules import make_schedule, named_betas, schedule_from_betas


def test_linear_betas_golden():
    b = named_betas("linear", 1000)
    assert b[0] == pytest.approx(1e-4)
    assert b[-1] == pytest.approx(2e-2)
    # 1000-step scaling: 100-step linear schedule stretches by 10x
    b100 = named_betas("linear", 100)
    assert b100[0] == pytest.approx(1e-3)


def test_cosine_betas_golden():
    b = named_betas("cosine", 1000)
    # closed form for the first beta: 1 - abar(1/1000)/abar(0)
    f = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    assert b[0] == pytest.approx(1.0 - f(1 / 1000) / f(0), rel=1e-9)
    assert np.all(b <= 0.999 + 1e-12)
    assert np.all(b > 0)


def test_schedule_coefficients_identities():
    s = make_schedule("cosine", 50)
    acp = np.asarray(s.alphas_cumprod)
    assert np.allclose(np.asarray(s.sqrt_alphas_cumprod) ** 2, acp, atol=1e-6)
    assert np.allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod) ** 2, 1 - acp, atol=1e-6
    )
    # DDPM identity: for consistent (x0, xt, eps), the posterior mean equals
    # (xt − β/√(1−ᾱ)·ε)/√α
    betas = np.asarray(s.betas)
    rng = np.random.RandomState(0)
    x0 = rng.randn(3, 5, 2).astype(np.float32)
    eps = rng.randn(3, 5, 2).astype(np.float32)
    t = jnp.array([1, 20, 49])
    xt = gaussian.q_sample(s, jnp.asarray(x0), t, jnp.asarray(eps))
    mean, _, _ = gaussian.q_posterior_mean_variance(s, jnp.asarray(x0), xt, t)
    tn = np.asarray(t)
    coef = (betas[tn] / np.sqrt(1 - acp[tn]))[:, None, None]
    expected = (np.asarray(xt) - coef * eps) / np.sqrt(1 - betas[tn])[:, None, None]
    assert np.allclose(np.asarray(mean), expected, atol=1e-4)


def test_q_sample_roundtrip():
    s = make_schedule("cosine", 100)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 16, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 10, 50, 99])
    xt = gaussian.q_sample(s, x0, t, noise)
    # invert: eps recovered from (xt, x0) must equal the injected noise
    eps = gaussian.predict_eps_from_x0(s, xt, t, x0)
    assert jnp.allclose(eps, noise, atol=1e-3)
    # and x0 recovered from (xt, eps)
    x0r = gaussian.predict_x0_from_eps(s, xt, t, eps)
    assert jnp.allclose(x0r, x0, atol=1e-3)


def test_v_parameterization_consistency():
    s = make_schedule("cosine", 100)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.array([5, 70])
    xt = gaussian.q_sample(s, x0, t, noise)
    from audio2photoreal_tpu.diffusion.schedules import extract

    v = (
        extract(s.sqrt_alphas_cumprod, t, x0.ndim) * noise
        - extract(s.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * x0
    )
    x0r = gaussian.predict_x0_from_v(s, xt, t, v)
    assert jnp.allclose(x0r, x0, atol=1e-4)


def test_q_posterior_golden_small():
    # 3-step hand-computed schedule
    betas = np.array([0.1, 0.2, 0.3])
    s = schedule_from_betas(betas)
    acp = np.cumprod(1 - betas)
    t = jnp.array([1])
    x0 = jnp.ones((1, 1, 1))
    xt = jnp.full((1, 1, 1), 2.0)
    mean, var, logvar = gaussian.q_posterior_mean_variance(s, x0, xt, t)
    c1 = betas[1] * np.sqrt(acp[0]) / (1 - acp[1])
    c2 = (1 - acp[0]) * np.sqrt(1 - betas[1]) / (1 - acp[1])
    assert float(mean[0, 0, 0]) == pytest.approx(c1 * 1.0 + c2 * 2.0, rel=1e-5)
    expected_var = betas[1] * (1 - acp[0]) / (1 - acp[1])
    assert float(var[0, 0, 0]) == pytest.approx(expected_var, rel=1e-5)


def test_space_timesteps_ddim():
    kept = space_timesteps(1000, "ddim100")
    assert len(kept) == 100
    assert kept == set(range(0, 1000, 10))
    kept = space_timesteps(1000, "ddim500")
    assert len(kept) == 500


def test_respaced_schedule_alphabar_exact():
    """Respacing must preserve alphabar at the kept steps exactly."""
    base = make_schedule("cosine", 1000)
    r = respaced_schedule("cosine", 1000, "ddim50")
    kept = sorted(space_timesteps(1000, "ddim50"))
    acp_base = np.asarray(base.alphas_cumprod)[kept]
    acp_resp = np.asarray(r.alphas_cumprod)
    assert np.allclose(acp_base, acp_resp, rtol=1e-5)
    assert np.array_equal(np.asarray(r.timestep_map), np.asarray(kept))


def test_ddim_deterministic_recovers_x0_with_oracle():
    """With an oracle model that returns the true x0, DDIM (eta=0) from pure
    noise converges to... the oracle x0 — checks the update plumbing."""
    s = maybe_respaced("cosine", 1000, "ddim25")
    x0_true = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 4))

    def oracle(x, t):
        return jnp.broadcast_to(x0_true, x.shape)

    xT = jax.random.normal(jax.random.PRNGKey(5), x0_true.shape)
    res = sampling.ddim_sample_loop(s, "xstart", oracle, xT, jax.random.PRNGKey(6))
    assert jnp.allclose(res.sample, x0_true, atol=1e-2)
    assert jnp.allclose(res.pred_xstart, x0_true, atol=1e-6)


def test_ancestral_loop_runs_and_is_finite():
    s = maybe_respaced("cosine", 1000, "ddim10")
    def model(x, t):
        return jnp.zeros_like(x)
    xT = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 4))
    res = sampling.p_sample_loop(s, "xstart", "fixed_small", model, xT, jax.random.PRNGKey(8))
    assert bool(jnp.all(jnp.isfinite(res.sample)))


def test_plms_loop_with_oracle():
    s = maybe_respaced("cosine", 1000, "ddim25")
    x0_true = jax.random.normal(jax.random.PRNGKey(9), (1, 4, 2))

    def oracle(x, t):
        return jnp.broadcast_to(x0_true, x.shape)

    xT = jax.random.normal(jax.random.PRNGKey(10), x0_true.shape)
    res = sampling.plms_sample_loop(s, "xstart", oracle, xT)
    assert jnp.allclose(res.sample, x0_true, atol=1e-2)


def test_masked_l2_counts_only_valid():
    a = jnp.zeros((1, 4, 2))
    b = jnp.ones((1, 4, 2))
    mask = jnp.array([[[1.0], [1.0], [0.0], [0.0]]])
    out = losses.masked_l2(a, b, mask)
    assert float(out[0]) == pytest.approx(1.0)  # mean over the 4 valid elements


def test_training_losses_xstart_target():
    s = make_schedule("cosine", 100)
    x0 = jax.random.normal(jax.random.PRNGKey(11), (2, 6, 3))
    noise = jax.random.normal(jax.random.PRNGKey(12), x0.shape)
    t = jnp.array([3, 50])
    xt = gaussian.q_sample(s, x0, t, noise)
    terms = losses.training_losses(s, "xstart", x0, x0, xt, t, with_vb=False)
    assert float(terms["mse"].sum()) == pytest.approx(0.0, abs=1e-10)
    terms2 = losses.training_losses(
        s, "xstart", jnp.zeros_like(x0), x0, xt, t, lambda_vel=1.0, with_vb=True
    )
    assert terms2["loss"].shape == (2,)
    assert bool(jnp.all(jnp.isfinite(terms2["vb"])))


def test_normal_kl_golden():
    # KL(N(0,1) || N(0,1)) = 0 ; KL(N(1,1)||N(0,1)) = 0.5
    z = jnp.zeros(())
    assert float(losses.normal_kl(z, z, z, z)) == pytest.approx(0.0)
    assert float(losses.normal_kl(jnp.ones(()), z, z, z)) == pytest.approx(0.5)


def test_ddim_reverse_roundtrip():
    """Deterministic DDIM encode (x_t → x_{t+1}) inverts the forward DDIM step
    under an oracle x0 model."""
    from audio2photoreal_tpu.diffusion.sampling import ddim_reverse_step

    s = make_schedule("cosine", 100)
    x0 = jax.random.normal(jax.random.PRNGKey(20), (1, 6, 3))

    def oracle(x, t):
        return jnp.broadcast_to(x0, x.shape)

    # start at a mid state consistent with x0
    t = jnp.array([50])
    eps = jax.random.normal(jax.random.PRNGKey(21), x0.shape)
    xt = gaussian.q_sample(s, x0, t, eps)
    # reverse: t → t+1 with the oracle's x0 prediction
    x_next = ddim_reverse_step(s, "xstart", oracle(xt, t), xt, t)
    # forward DDIM step (eta=0) from t+1 must return to xt
    t1 = jnp.array([51])
    x0p = oracle(x_next, t1)
    epsp = gaussian.predict_eps_from_x0(s, x_next, t1, x0p)
    from audio2photoreal_tpu.diffusion.schedules import extract

    abar_prev = extract(s.alphas_cumprod_prev, t1, xt.ndim)
    back = x0p * jnp.sqrt(abar_prev) + jnp.sqrt(1 - abar_prev) * epsp
    np.testing.assert_allclose(np.asarray(back), np.asarray(xt), atol=1e-4)


def test_respace_sections_mode():
    """Comma-separated section counts (respace.py non-ddim mode)."""
    kept = space_timesteps(100, "10,10,10")
    assert len(kept) == 30
    assert 0 in kept
    r = respaced_schedule("linear", 100, "10,10,10")
    assert r.num_timesteps == 30
    assert int(r.timestep_map[0]) == 0


def test_classifier_guidance_hooks():
    """condition_mean shifts by Σ·grad; condition_score re-estimates x0."""
    s = make_schedule("cosine", 100)
    x0 = jax.random.normal(jax.random.PRNGKey(22), (1, 4, 2))
    t = jnp.array([30])
    eps = jax.random.normal(jax.random.PRNGKey(23), x0.shape)
    xt = gaussian.q_sample(s, x0, t, eps)
    grad = jnp.ones_like(x0) * 0.1
    mean, var, _ = gaussian.q_posterior_mean_variance(s, x0, xt, t)
    shifted = gaussian.condition_mean(mean, var, grad)
    np.testing.assert_allclose(np.asarray(shifted - mean), np.asarray(var * grad), atol=1e-6)
    x0_new = gaussian.condition_score(s, xt, t, x0, grad)
    assert not np.allclose(np.asarray(x0_new), np.asarray(x0))
