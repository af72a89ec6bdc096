"""Beta schedules and precomputed diffusion coefficients.

Functional analogue of the coefficient block in the reference's
GaussianDiffusion constructor (reference: diffusion/gaussian_diffusion.py:26-64
``get_named_beta_schedule`` and :96-214 coefficient precompute).  All
coefficients live in one immutable NamedTuple of device arrays so that
samplers can gather per-timestep scalars inside a ``lax.scan``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def named_betas(schedule: str, steps: int, scale_1000: bool = True) -> np.ndarray:
    """Named beta schedule.

    - "linear": DDPM linear schedule, scaled so any `steps` matches the
      1000-step limit (betas 1e-4..0.02 at 1000 steps).
    - "cosine": Nichol-Dhariwal squared-cosine alphabar, beta clipped at 0.999.
    """
    if schedule == "linear":
        scale = (1000.0 / steps) if scale_1000 else 1.0
        return np.linspace(scale * 1e-4, scale * 2e-2, steps, dtype=np.float64)
    if schedule == "cosine":
        def alpha_bar(t: float) -> float:
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = []
        for i in range(steps):
            t1, t2 = i / steps, (i + 1) / steps
            betas.append(min(1.0 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.asarray(betas, dtype=np.float64)
    raise ValueError(f"unknown beta schedule {schedule!r}")


class Schedule(NamedTuple):
    """All per-timestep coefficients, shape [T], float32 on device.

    ``timestep_map`` maps a respaced index to the original-schedule timestep
    (identity for the full schedule); the denoiser is always called with the
    ORIGINAL timestep so its time embedding matches training
    (reference: diffusion/respace.py:130-145 _WrappedModel).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    timestep_map: jnp.ndarray  # int32 [T]

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def schedule_from_betas(betas: np.ndarray, timestep_map: np.ndarray | None = None) -> Schedule:
    betas = np.asarray(betas, dtype=np.float64)
    (T,) = betas.shape
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    acp_next = np.append(acp[1:], 0.0)

    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
    # log clipped because posterior variance is 0 at t=0
    post_logvar = np.log(np.append(post_var[1], post_var[1:]))

    if timestep_map is None:
        timestep_map = np.arange(T)

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(acp),
        alphas_cumprod_prev=f32(acp_prev),
        alphas_cumprod_next=f32(acp_next),
        sqrt_alphas_cumprod=f32(np.sqrt(acp)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - acp)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(post_logvar),
        posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
        posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
    )


def make_schedule(schedule: str = "cosine", steps: int = 1000) -> Schedule:
    return schedule_from_betas(named_betas(schedule, steps))


def extract(coefs: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and reshape to [B, 1, ..., 1] for broadcast."""
    out = coefs[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))
