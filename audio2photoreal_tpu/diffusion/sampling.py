"""Samplers as single-compile ``lax.scan`` loops.

The reference runs Python for-loops of per-step graph launches
(reference: diffusion/gaussian_diffusion.py — p_sample_loop:525,
ddim_sample_loop:815-936, plms_sample_loop:1044) and, with CFG, two separate
model forwards per step (model/cfg_sampler.py:31-33) that each re-encode the
audio conditioning (model/diffusion.py:285-293).  Here:

- the whole denoise loop is one ``lax.scan`` compiled once,
- conditioning is encoded ONCE outside the scan and closed over by `model_fn`,
- CFG stacks cond/uncond on the batch axis for a single forward (see
  models/cfg.py), keeping the MXU busy with a 2B batch.

`model_fn(x, t) -> model_out` receives ORIGINAL-schedule timesteps int32 [B];
coefficient lookups use the respaced index internally.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from audio2photoreal_tpu.diffusion import gaussian
from audio2photoreal_tpu.diffusion.schedules import Schedule, extract

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class SampleResult(NamedTuple):
    sample: jnp.ndarray  # final x_0-level sample from the last transition
    pred_xstart: jnp.ndarray  # model's final x0 estimate (reference returns this,
    # gaussian_diffusion.py:862)


def _step_inputs(s: Schedule, i: jnp.ndarray, batch: int):
    """Respaced index i → (coef index t[B], model timestep t_model[B])."""
    t = jnp.full((batch,), i, dtype=jnp.int32)
    t_model = jnp.full((batch,), s.timestep_map[i], dtype=jnp.int32)
    return t, t_model


def ddim_sample_loop(
    s: Schedule,
    predict: str,
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    key: jax.Array,
    *,
    eta: float = 0.0,
    clip: Optional[float] = None,
) -> SampleResult:
    """DDIM (reference: gaussian_diffusion.py:667-936)."""
    T = s.num_timesteps
    B = x_T.shape[0]

    def body(carry, i):
        x, k = carry
        k, sub = jax.random.split(k)
        t, t_model = _step_inputs(s, i, B)
        out = model_fn(x, t_model)
        x0 = gaussian.model_prediction_to_x0(s, predict, out, x, t, clip)
        eps = gaussian.predict_eps_from_x0(s, x, t, x0)

        abar = extract(s.alphas_cumprod, t, x.ndim)
        abar_prev = extract(s.alphas_cumprod_prev, t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1.0 - abar_prev) / (1.0 - abar))
            * jnp.sqrt(1.0 - abar / abar_prev)
        )
        mean = x0 * jnp.sqrt(abar_prev) + jnp.sqrt(1.0 - abar_prev - sigma**2) * eps
        noise = jax.random.normal(sub, x.shape, x.dtype)
        nonzero = (i > 0).astype(x.dtype)
        x_next = mean + nonzero * sigma * noise
        return (x_next, k), x0

    (x_final, _), x0s = jax.lax.scan(body, (x_T, key), jnp.arange(T - 1, -1, -1))
    return SampleResult(sample=x_final, pred_xstart=x0s[-1])


def ddim_reverse_step(
    s: Schedule,
    predict: str,
    model_out: jnp.ndarray,
    x: jnp.ndarray,
    t: jnp.ndarray,
    clip: Optional[float] = None,
) -> jnp.ndarray:
    """Deterministic encoding x_t → x_{t+1} (reference: gaussian_diffusion.py:777-813)."""
    x0 = gaussian.model_prediction_to_x0(s, predict, model_out, x, t, clip)
    eps = gaussian.predict_eps_from_x0(s, x, t, x0)
    abar_next = extract(s.alphas_cumprod_next, t, x.ndim)
    return x0 * jnp.sqrt(abar_next) + jnp.sqrt(1.0 - abar_next) * eps


def p_sample_loop(
    s: Schedule,
    predict: str,
    var_type: str,
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    key: jax.Array,
    *,
    clip: Optional[float] = None,
) -> SampleResult:
    """Ancestral sampling (reference: gaussian_diffusion.py:434-616; note the
    reference's non-DDIM path has an undefined-variable bug at :476 — this
    implementation is the corrected math)."""
    T = s.num_timesteps
    B = x_T.shape[0]

    def body(carry, i):
        x, k = carry
        k, sub = jax.random.split(k)
        t, t_model = _step_inputs(s, i, B)
        out = model_fn(x, t_model)
        pmv = gaussian.p_mean_variance(s, predict, var_type, out, x, t, clip)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        nonzero = (i > 0).astype(x.dtype)
        x_next = pmv.mean + nonzero * jnp.exp(0.5 * pmv.log_variance) * noise
        return (x_next, k), pmv.pred_xstart

    (x_final, _), x0s = jax.lax.scan(body, (x_T, key), jnp.arange(T - 1, -1, -1))
    return SampleResult(sample=x_final, pred_xstart=x0s[-1])


def plms_sample_loop(
    s: Schedule,
    predict: str,
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    *,
    clip: Optional[float] = None,
) -> SampleResult:
    """Pseudo linear multi-step (reference: gaussian_diffusion.py:938-1112).

    The eps history lives in the scan carry as a fixed [4, ...] buffer with a
    step counter selecting the 1st/2nd/3rd/4th-order update — no dynamic
    Python state, one compile.
    """
    T = s.num_timesteps
    B = x_T.shape[0]

    def transfer(x, eps, t):
        abar = extract(s.alphas_cumprod, t, x.ndim)
        abar_prev = extract(s.alphas_cumprod_prev, t, x.ndim)
        x0 = (x - jnp.sqrt(1.0 - abar) * eps) / jnp.sqrt(abar)
        return x0 * jnp.sqrt(abar_prev) + jnp.sqrt(1.0 - abar_prev) * eps

    def get_eps(x, t, t_model):
        out = model_fn(x, t_model)
        x0 = gaussian.model_prediction_to_x0(s, predict, out, x, t, clip)
        return gaussian.predict_eps_from_x0(s, x, t, x0), x0

    def body(carry, args):
        x, hist, n = carry
        i = args
        t, t_model = _step_inputs(s, i, B)
        eps, x0 = get_eps(x, t, t_model)

        # Adams-Bashforth coefficients by available history length
        e0 = eps
        e1, e2, e3 = hist[0], hist[1], hist[2]
        eps1 = (3 * e0 - e1) / 2
        eps2 = (23 * e0 - 16 * e1 + 5 * e2) / 12
        eps3 = (55 * e0 - 59 * e1 + 37 * e2 - 9 * e3) / 24
        # n = number of previous eps available (0..3+)
        eps_prime = jnp.where(
            n == 0, e0, jnp.where(n == 1, eps1, jnp.where(n == 2, eps2, eps3))
        )
        x_next = transfer(x, eps_prime, t)
        new_hist = jnp.stack([eps, hist[0], hist[1]])
        return (x_next, new_hist, jnp.minimum(n + 1, 3)), x0

    hist0 = jnp.zeros((3,) + x_T.shape, x_T.dtype)
    (x_final, _, _), x0s = jax.lax.scan(
        body, (x_T, hist0, jnp.int32(0)), jnp.arange(T - 1, -1, -1)
    )
    return SampleResult(sample=x_final, pred_xstart=x0s[-1])


SAMPLERS = {
    "ddim": ddim_sample_loop,
    "ancestral": p_sample_loop,
    "plms": plms_sample_loop,
}
