"""Diffusion training losses.

Functional port of the reference's loss surface:
- masked L2 over valid-length × non-missing masks (gaussian_diffusion.py:186-213, 1229-1245)
- KL / discretized-gaussian NLL diagnostics (diffusion/losses.py:18-83)
- velocity loss on frame differences (gaussian_diffusion.py:1236-1245)

Layout: x is [B, T, C]; masks broadcast as [B, T, 1].
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from audio2photoreal_tpu.diffusion import gaussian
from audio2photoreal_tpu.diffusion.schedules import Schedule


def masked_l2(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over unmasked elements, per batch element.

    `mask` is 1 where VALID.  The reference divides the per-sample sum by the
    number of unmasked elements (gaussian_diffusion.py:201-213).
    """
    diff2 = (a - b) ** 2 * mask
    sums = diff2.reshape(diff2.shape[0], -1).sum(axis=-1)
    counts = jnp.broadcast_to(mask, diff2.shape).reshape(diff2.shape[0], -1).sum(axis=-1)
    return sums / jnp.maximum(counts, 1.0)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) in nats (reference: diffusion/losses.py:18-45)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of images discretized to 1/255 bins
    (reference: diffusion/losses.py:56-83)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.maximum(cdf_delta, 1e-12))),
    )


def vb_term(
    s: Schedule,
    predict: str,
    var_type: str,
    model_out: jnp.ndarray,
    x0: jnp.ndarray,
    xt: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Variational-bound diagnostic in bits (reference: gaussian_diffusion.py:1114-1160)."""
    true_mean, _, true_logvar = gaussian.q_posterior_mean_variance(s, x0, xt, t)
    pmv = gaussian.p_mean_variance(s, predict, var_type, model_out, xt, t)
    kl = normal_kl(true_mean, true_logvar, pmv.mean, pmv.log_variance)
    kl = kl.reshape(kl.shape[0], -1).mean(axis=-1) / jnp.log(2.0)
    nll = -discretized_gaussian_log_likelihood(
        x0, means=pmv.mean, log_scales=0.5 * pmv.log_variance
    )
    nll = nll.reshape(nll.shape[0], -1).mean(axis=-1) / jnp.log(2.0)
    return jnp.where(t == 0, nll, kl)


def training_losses(
    s: Schedule,
    predict: str,
    model_out: jnp.ndarray,
    x0: jnp.ndarray,
    xt: jnp.ndarray,
    t: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    lambda_vel: float = 0.0,
    var_type: str = "fixed_small",
    with_vb: bool = True,
    vel_mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-sample loss dict (reference: gaussian_diffusion.py:1195-1271).

    With ``predict == "xstart"`` the MSE target is x0 itself; eps/v targets
    are derived consistently.  ``mask`` is [B, T, 1] valid×non-missing.
    ``vel_mask`` is the VALIDITY-only mask for the velocity term — the
    reference masks rot_mse by mask×missing but vel_mse by mask alone
    (gaussian_diffusion.py:1229-1245); defaults to ``mask`` (they coincide
    whenever no frames are missing, e.g. the pose stream).
    """
    if mask is None:
        mask = jnp.ones(x0.shape[:2] + (1,), x0.dtype)
    if vel_mask is None:
        vel_mask = mask
    if predict == "xstart":
        target = x0
    elif predict == "eps":
        target = gaussian.predict_eps_from_x0(s, xt, t, x0)
    elif predict == "v":
        eps = gaussian.predict_eps_from_x0(s, xt, t, x0)
        from audio2photoreal_tpu.diffusion.schedules import extract

        target = (
            extract(s.sqrt_alphas_cumprod, t, x0.ndim) * eps
            - extract(s.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * x0
        )
    else:
        raise ValueError(predict)

    terms: Dict[str, jnp.ndarray] = {}
    terms["mse"] = masked_l2(target, model_out, mask)
    if lambda_vel > 0.0:
        # velocity on the x0-level prediction (only meaningful for xstart)
        pred_x0 = gaussian.model_prediction_to_x0(s, predict, model_out, xt, t)
        vel_t = target[:, 1:] - target[:, :-1] if predict == "xstart" else x0[:, 1:] - x0[:, :-1]
        vel_p = pred_x0[:, 1:] - pred_x0[:, :-1]
        terms["vel_mse"] = masked_l2(vel_t, vel_p, vel_mask[:, 1:])
    if with_vb:
        # diagnostic only — reference computes it under no_grad
        # (gaussian_diffusion.py:1247-1255)
        terms["vb"] = vb_term(
            s, predict, var_type, jax.lax.stop_gradient(model_out), x0, xt, t
        )
    loss = terms["mse"]
    if "vel_mse" in terms:
        loss = loss + lambda_vel * terms["vel_mse"]
    terms["loss"] = loss
    return terms
