"""Timestep schedule samplers as pure functional state.

Reference: diffusion/resample.py — UniformSampler:75,
LossSecondMomentResampler:138 (importance sampling by per-timestep loss
second moment), LossAwareSampler.update_with_local_losses:85 which syncs
losses across ranks with dist.all_gather.  Here the history is an explicit
pytree updated inside the jitted train step; cross-device sync is a
``lax.pmean`` over the data axis (a no-op un-meshed).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from audio2photoreal_tpu.parallel.collectives import pmean


def uniform_sample(key: jax.Array, num_timesteps: int, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    weights = jnp.ones((batch,), jnp.float32)
    return t, weights


class LossSecondMomentState(NamedTuple):
    history: jnp.ndarray  # [T, history_per_term] float32
    counts: jnp.ndarray  # [T] int32

    @classmethod
    def init(cls, num_timesteps: int, history_per_term: int = 10) -> "LossSecondMomentState":
        return cls(
            history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
        )


def loss_second_moment_weights(
    state: LossSecondMomentState, uniform_prob: float = 0.001
) -> jnp.ndarray:
    """Per-timestep sampling probabilities (resample.py:144-157)."""
    warmed = jnp.all(state.counts == state.history.shape[1])
    w = jnp.sqrt(jnp.mean(state.history**2, axis=-1))
    w = w / jnp.maximum(w.sum(), 1e-12)
    w = w * (1.0 - uniform_prob) + uniform_prob / w.shape[0]
    uniform = jnp.full_like(w, 1.0 / w.shape[0])
    return jnp.where(warmed, w, uniform)


def loss_second_moment_sample(
    key: jax.Array, state: LossSecondMomentState, batch: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    p = loss_second_moment_weights(state)
    t = jax.random.choice(key, p.shape[0], (batch,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def loss_second_moment_update(
    state: LossSecondMomentState,
    t: jnp.ndarray,
    losses: jnp.ndarray,
    axis: str = "data",
) -> LossSecondMomentState:
    """Scatter new losses into the ring-buffer history.

    The reference gathers (t, loss) pairs across ranks first
    (resample.py:97-118); under a mesh the train step computes this on
    replicated (already all-gathered) t/loss values, or callers can pmean the
    resulting state, which keeps replicas identical.
    """
    history, counts = state.history, state.counts
    H = history.shape[1]

    def body(carry, tl):
        history, counts = carry
        ti, li = tl
        c = counts[ti]
        # ring buffer: shift-left once full, else append at c
        row = history[ti]
        full = c == H
        new_row = jnp.where(full, jnp.concatenate([row[1:], li[None]]), row.at[jnp.minimum(c, H - 1)].set(li))
        history = history.at[ti].set(new_row)
        counts = counts.at[ti].set(jnp.minimum(c + 1, H))
        return (history, counts), None

    (history, counts), _ = jax.lax.scan(body, (history, counts), (t, losses))
    return LossSecondMomentState(pmean(history, axis), counts)
