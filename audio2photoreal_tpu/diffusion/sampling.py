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
    order: int = 2,
    clip: Optional[float] = None,
) -> SampleResult:
    """Pseudo linear multi-step (reference: gaussian_diffusion.py:938-1145).

    Reference-faithful for ``order`` 1-4 (its default is 2):
    - first step with order>1 runs the Pseudo Improved Euler warm-up — a
      second model eval at ``(mean_pred, t-1)`` averaged into eps
      (gaussian_diffusion.py:992-1005),
    - subsequent steps are Adams-Bashforth over the last
      ``min(order, len(history))`` eps (:1008-1034),
    - at t == 0 the transition returns pred_xstart itself (:1038-1039).

    The first step is unrolled OUTSIDE the scan (it alone needs two model
    evals); the remaining T-1 steps scan with the eps history in the carry as
    a fixed [order-1, ...] buffer — no dynamic Python state, one compile.
    """
    if not 1 <= order <= 4:
        raise ValueError("order must be 1-4")
    T = s.num_timesteps
    B = x_T.shape[0]

    def get_eps(x, i):
        t, t_model = _step_inputs(s, i, B)
        out = model_fn(x, t_model)
        x0 = gaussian.model_prediction_to_x0(s, predict, out, x, t, clip)
        return gaussian.predict_eps_from_x0(s, x, t, x0), x0

    def ab_transfer(x, eps_prime, i):
        # x_{t-1} from x_t via the eps_prime-consistent x0 (reference
        # _predict_xstart_from_eps + mean_pred composition)
        t = jnp.full((B,), i, jnp.int32)
        abar_prev = extract(s.alphas_cumprod_prev, t, x.ndim)
        x0p = gaussian.predict_x0_from_eps(s, x, t, eps_prime)
        return x0p * jnp.sqrt(abar_prev) + jnp.sqrt(1.0 - abar_prev) * eps_prime

    n_hist = max(order - 1, 1)

    def body(carry, i):
        x, hist, n = carry
        eps, x0 = get_eps(x, i)
        # cur_order = min(order, n + 1) with n previous eps in the buffer;
        # hist[0] is the most recent
        e0 = eps
        e1 = hist[0]
        e2 = hist[1] if n_hist > 1 else hist[0]
        e3 = hist[2] if n_hist > 2 else hist[0]
        by_order = [
            e0,
            (3 * e0 - e1) / 2,
            (23 * e0 - 16 * e1 + 5 * e2) / 12,
            (55 * e0 - 59 * e1 + 37 * e2 - 9 * e3) / 24,
        ]
        cur = jnp.minimum(order - 1, n)
        eps_prime = by_order[0]
        for o in range(1, order):
            eps_prime = jnp.where(cur == o, by_order[o], eps_prime)
        mean_pred = ab_transfer(x, eps_prime, i)
        # t == 0: the transition collapses to pred_xstart (:1038-1039)
        x_next = jnp.where(i > 0, mean_pred, x0)
        new_hist = jnp.concatenate([eps[None], hist[:-1]], axis=0)
        return (x_next, new_hist, jnp.minimum(n + 1, order - 1)), x0

    # ---- first step (i = T-1), unrolled: Pseudo Improved Euler ------- #
    i0 = T - 1
    eps0, x0_first = get_eps(x_T, i0)
    if order > 1:
        mean_pred = ab_transfer(x_T, eps0, i0)
        # second eval at (mean_pred, t-1); at T == 1 the reference would index
        # t-1 = -1 — excluded by construction (a 1-step PLMS is order 1)
        eps2, _ = get_eps(mean_pred, max(i0 - 1, 0))
        eps_prime = (eps0 + eps2) / 2
        x1 = ab_transfer(x_T, eps_prime, i0)
    else:
        x1 = ab_transfer(x_T, eps0, i0)
    x1 = jnp.where(i0 > 0, x1, x0_first)
    if T == 1:
        return SampleResult(sample=x1, pred_xstart=x0_first)

    hist0 = jnp.concatenate(
        [eps0[None]] + [jnp.zeros_like(eps0)[None]] * (n_hist - 1), axis=0
    )
    (x_final, _, _), x0s = jax.lax.scan(
        body, (x1, hist0, jnp.int32(1)), jnp.arange(T - 2, -1, -1)
    )
    return SampleResult(sample=x_final, pred_xstart=x0s[-1])


SAMPLERS = {
    "ddim": ddim_sample_loop,
    "ancestral": p_sample_loop,
    "plms": plms_sample_loop,
}
