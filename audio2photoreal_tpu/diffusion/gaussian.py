"""Pure q/p diffusion math.

Functional re-expression of the reference's GaussianDiffusion methods
(reference: diffusion/gaussian_diffusion.py — q_sample:215,
q_posterior_mean_variance:235, p_mean_variance:259, _predict helpers:328-356,
condition_mean/score:358-432).  Every function is shape-polymorphic: `x` is
[B, ...] and `t` is int32 [B].

Data layout note: the reference permutes motion to ``B,C,1,T`` to reuse
image-diffusion code (gaussian_diffusion.py:313,1229).  This framework keeps
the natural sequence layout ``B,T,C`` everywhere; converters reshape only at
the results.npy boundary (apps/generate.py) for file compatibility.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from audio2photoreal_tpu.diffusion.schedules import Schedule, extract


def q_mean_variance(s: Schedule, x0: jnp.ndarray, t: jnp.ndarray):
    mean = extract(s.sqrt_alphas_cumprod, t, x0.ndim) * x0
    var = extract(1.0 - s.alphas_cumprod, t, x0.ndim)
    logvar = extract(s.log_one_minus_alphas_cumprod, t, x0.ndim)
    return mean, var, logvar


def q_sample(s: Schedule, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Diffuse x0 to x_t: sqrt(ᾱ_t)·x0 + sqrt(1-ᾱ_t)·ε."""
    return (
        extract(s.sqrt_alphas_cumprod, t, x0.ndim) * x0
        + extract(s.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise
    )


def q_posterior_mean_variance(s: Schedule, x0: jnp.ndarray, xt: jnp.ndarray, t: jnp.ndarray):
    """q(x_{t-1} | x_t, x_0) posterior."""
    mean = (
        extract(s.posterior_mean_coef1, t, x0.ndim) * x0
        + extract(s.posterior_mean_coef2, t, x0.ndim) * xt
    )
    var = extract(s.posterior_variance, t, x0.ndim)
    logvar = extract(s.posterior_log_variance_clipped, t, x0.ndim)
    return mean, var, logvar


def predict_x0_from_eps(s: Schedule, xt: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray):
    return (
        extract(s.sqrt_recip_alphas_cumprod, t, xt.ndim) * xt
        - extract(s.sqrt_recipm1_alphas_cumprod, t, xt.ndim) * eps
    )


def predict_eps_from_x0(s: Schedule, xt: jnp.ndarray, t: jnp.ndarray, x0: jnp.ndarray):
    return (
        extract(s.sqrt_recip_alphas_cumprod, t, xt.ndim) * xt - x0
    ) / extract(s.sqrt_recipm1_alphas_cumprod, t, xt.ndim)


def predict_x0_from_v(s: Schedule, xt: jnp.ndarray, t: jnp.ndarray, v: jnp.ndarray):
    """v-parameterization: v = sqrt(ᾱ)·ε − sqrt(1−ᾱ)·x0."""
    return (
        extract(s.sqrt_alphas_cumprod, t, xt.ndim) * xt
        - extract(s.sqrt_one_minus_alphas_cumprod, t, xt.ndim) * v
    )


def model_prediction_to_x0(
    s: Schedule,
    predict: str,
    model_out: jnp.ndarray,
    xt: jnp.ndarray,
    t: jnp.ndarray,
    clip: Optional[float] = None,
) -> jnp.ndarray:
    if predict == "xstart":
        x0 = model_out
    elif predict == "eps":
        x0 = predict_x0_from_eps(s, xt, t, model_out)
    elif predict == "v":
        x0 = predict_x0_from_v(s, xt, t, model_out)
    else:
        raise ValueError(f"unknown prediction type {predict!r}")
    if clip is not None:
        x0 = jnp.clip(x0, -clip, clip)
    return x0


class PMeanVar(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray


def p_mean_variance(
    s: Schedule,
    predict: str,
    var_type: str,
    model_out: jnp.ndarray,
    xt: jnp.ndarray,
    t: jnp.ndarray,
    clip: Optional[float] = None,
) -> PMeanVar:
    """Model forward output → p(x_{t-1} | x_t) moments (FIXED variance family,
    matching the reference operating point: utils/model_util.py:108-114)."""
    x0 = model_prediction_to_x0(s, predict, model_out, xt, t, clip)
    mean, _, _ = q_posterior_mean_variance(s, x0, xt, t)
    if var_type == "fixed_small":
        var = extract(s.posterior_variance, t, xt.ndim)
        logvar = extract(s.posterior_log_variance_clipped, t, xt.ndim)
    elif var_type == "fixed_large":
        # betas with beta_0 replaced by posterior_variance[1] for stability
        betas = jnp.concatenate([s.posterior_variance[1:2], s.betas[1:]])
        var = extract(betas, t, xt.ndim)
        logvar = jnp.log(jnp.maximum(var, 1e-20))
    else:
        raise ValueError(f"unknown var_type {var_type!r}")
    return PMeanVar(mean, var, logvar, x0)


def condition_mean(
    mean: jnp.ndarray,
    variance: jnp.ndarray,
    grad: jnp.ndarray,
) -> jnp.ndarray:
    """Classifier-guidance mean shift: μ + Σ·∇ log p(y|x)
    (reference: gaussian_diffusion.py:358-380)."""
    return mean + variance * grad


def condition_score(
    s: Schedule,
    xt: jnp.ndarray,
    t: jnp.ndarray,
    pred_x0: jnp.ndarray,
    grad: jnp.ndarray,
) -> jnp.ndarray:
    """Classifier-guided x0 re-estimate via the score route
    (reference: gaussian_diffusion.py:382-412)."""
    eps = predict_eps_from_x0(s, xt, t, pred_x0)
    eps = eps - extract(s.sqrt_one_minus_alphas_cumprod, t, xt.ndim) * grad
    return predict_x0_from_eps(s, xt, t, eps)
